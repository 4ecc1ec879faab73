"""Per-sub-discriminator roofline table (VERDICT r4 #4 done-criterion).

Combines measured walls from tools/tpu_disc_profile.py JSONL rows with
ANALYTIC FLOP and HBM-byte counts for each sub-discriminator at the
training shape (B, T), and prints a markdown table: achieved TFLOP/s vs
the chip's bf16 peak, achieved GB/s vs HBM peak, and which limit each
sub-discriminator sits against.  This is the evidence for whether the
GAN step's MFU ceiling is structural (narrow-channel conv stacks are
bandwidth-bound: FLOPs/byte far under the MXU's balance point) or
addressable.

Usage:
  python tools/disc_roofline.py /tmp/disc_f32.jsonl [/tmp/disc_bf16.jsonl] \
      [--batch 16] [--segment 8192] [--peak_tflops 197] [--hbm_gbs 819]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from spev_tpu.models.hifigan_disc import _MPD_CHANNELS, _MSD_SPEC, MPD_PERIODS


def mpd_cost(p: int, B: int, T: int, bytes_per: int):
    """FLOPs + HBM bytes for one period-p sub-discriminator."""
    H = (T + (-T) % p) // p
    flops, by = 0, B * T * bytes_per  # input read
    in_ch = 1
    for ch in _MPD_CHANNELS:  # k=(5,1), stride (3,1), pad (2,0)
        H_out = (H + 4 - 5) // 3 + 1
        flops += 2 * B * H_out * p * ch * in_ch * 5
        by += B * H_out * p * ch * bytes_per + in_ch * ch * 5 * bytes_per
        H, in_ch = H_out, ch
    # post1: k5 s1 pad2 (same H), post2: k3 s1 pad1
    flops += 2 * B * H * p * 1024 * in_ch * 5
    by += B * H * p * 1024 * bytes_per
    flops += 2 * B * H * p * 1 * 1024 * 3
    by += B * H * p * 1 * bytes_per
    return flops, by


def msd_cost(scale: int, B: int, T: int, bytes_per: int):
    L = T // (2 ** scale)
    flops, by = 0, B * L * bytes_per
    for (i_c, o_c, k, s, g, pd) in _MSD_SPEC:
        L_out = (L + 2 * pd - k) // s + 1
        flops += 2 * B * L_out * o_c * (i_c // g) * k
        by += B * L_out * o_c * bytes_per + o_c * (i_c // g) * k * bytes_per
        L = L_out
    flops += 2 * B * L * 1 * 1024 * 3
    by += B * L * bytes_per
    return flops, by


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl", nargs="+")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--segment", type=int, default=8192)
    ap.add_argument("--peak_tflops", type=float, default=197.0)
    ap.add_argument("--hbm_gbs", type=float, default=819.0)
    args = ap.parse_args()

    measured = {}  # (file_tag, disc) -> row
    tags = []
    for path in args.jsonl:
        tag = "bf16" if "bf16" in path else "f32"
        tags.append(tag)
        with open(path) as f:
            for line in f:
                r = json.loads(line)
                if "disc" in r:
                    measured[(tag, r["disc"])] = r

    B, T = args.batch, args.segment
    names, costs = [], {}
    for p in MPD_PERIODS:
        names.append(f"mpd_p{p}")
        costs[f"mpd_p{p}"] = {"f32": mpd_cost(p, B, T, 4),
                              "bf16": mpd_cost(p, B, T, 2)}
    for s in range(3):
        names.append(f"msd_s{s}")
        costs[f"msd_s{s}"] = {"f32": msd_cost(s, B, T, 4),
                              "bf16": msd_cost(s, B, T, 2)}

    hdr = ["sub-disc", "GFLOP (fwd)", "MB acts"]
    for tag in tags:
        hdr += [f"{tag} fwd ms", f"{tag} TF/s", f"{tag} GB/s", f"{tag} limit"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    tot = {tag: 0.0 for tag in tags}
    for n in names:
        fl, _ = costs[n]["f32"]
        row = [n, f"{fl / 1e9:.2f}", f"{costs[n]['f32'][1] / 1e6:.0f}"]
        for tag in tags:
            m = measured.get((tag, n))
            if not m:
                row += ["—"] * 4
                continue
            ms = m["fwd_ms"]
            tot[tag] += m.get("fwd_bwd_ms", ms)
            _, by = costs[n][tag if tag in ("f32", "bf16") else "f32"]
            tf = fl / (ms / 1e3) / 1e12
            gbs = by / (ms / 1e3) / 1e9
            lim = ("MXU" if tf / args.peak_tflops > gbs / args.hbm_gbs
                   else "HBM")
            pct = max(tf / args.peak_tflops, gbs / args.hbm_gbs) * 100
            row += [f"{ms:.2f}", f"{tf:.1f}", f"{gbs:.0f}",
                    f"{lim} {pct:.0f}%"]
        print("| " + " | ".join(row) + " |")
    for tag in tags:
        print(f"total fwd+bwd ({tag}): {tot[tag]:.1f} ms")


if __name__ == "__main__":
    main()
