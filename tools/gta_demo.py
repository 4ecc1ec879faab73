"""GTA fine-tuning evidence: does training the vocoder on the acoustic
model's own (teacher-forced) mels close the acoustic→vocoder mismatch?

The reference downloads ``LJ_FT_T2_V3`` — a HiFi-GAN *fine-tuned on
acoustic-model outputs* (reference ``PRODUCTION_SYSTEM_SUMMARY.md:214-218``)
— but cannot run that workflow.  This framework can
(``spev-vocoder-train --gta_checkpoint``, `spev_tpu/infer/gta.py`); this
tool produces the controlled evidence, on the offline synthetic formant
corpus (docs/QUALITY.md setup):

  baseline  a generator trained on ground-truth mels (``--baseline_gen``)
  control   baseline + N more steps on ground-truth mels
  gta       baseline + N more steps on TEACHER-FORCED PREDICTED mels

then scores each on the held-out utterances by vocoding the acoustic
model's predicted mel (the serving condition — what GTA exists to fix)
and, as a regression check, the ground-truth mel (copy synthesis).
Fine-tuning sees ONLY training-split utterances, so the val rows are
genuinely held out from both fine-tune arms (the baseline itself saw all
120 — a bias *against* the GTA arm, so a GTA win is conservative).

Usage:
  python tools/gta_demo.py --baseline_gen checkpoints/run/gen_*.spev \
      [--steps 2000] [--epochs 150] [--work /root/gta_demo] \
      [--out docs/demo/gta_metrics.json]

Phases are resumable: each skips itself if its artifact already exists
under --work.  The acoustic train runs in a subprocess on 8 virtual CPU
devices (the docs/QUALITY.md env); the vocoder fine-tunes and the eval
run on the default JAX platform (TPU when alive).
"""

import argparse
import glob
import json
import os
import re
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# phase: train (subprocess — 8 virtual CPU devices, the QUALITY.md env)
# ---------------------------------------------------------------------------

def phase_train(work: str, epochs: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tools.demo_common import build_quality_setup

    s = build_quality_setup(epochs)
    for epoch in range(epochs):
        m = s.trainer.train_epoch(s.bt.epoch(epoch))
        val = s.trainer.validate(s.bv.epoch(0))
        if epoch % 10 == 0 or epoch == epochs - 1:
            q = s.trainer.last_quality
            print(f"epoch {epoch}: loss {m['train_loss']:.3f} val {val:.3f} "
                  f"MCD {q.get('val_mcd_db', float('nan')):.1f} "
                  f"durerr {q.get('val_dur_err_pct', float('nan')):.1f}%",
                  flush=True)
    ckpt = s.trainer.save("gta_demo")
    shutil.copy(ckpt, os.path.join(work, "acoustic.spev"))

    # corpus copies: full (for eval) and train-split-only (for fine-tuning,
    # so the val utterances stay held out from both fine-tune arms)
    full = os.path.join(work, "corpus")
    if os.path.isdir(full):
        shutil.rmtree(full)
    shutil.copytree(s.corpus_root, full)
    va = set(int(re.match(r"u_(\d+)\.npz$", s.ds.files[i]).group(1))
             for i in s.va_idx)
    wavs = sorted(glob.glob(os.path.join(full, "**", "*.wav"), recursive=True))
    tr_dir = os.path.join(work, "corpus_train")
    tg_dir = os.path.join(tr_dir, "textgrids")
    os.makedirs(tg_dir, exist_ok=True)
    for w, path in enumerate(wavs):
        if w in va:
            continue
        base = os.path.splitext(os.path.basename(path))[0]
        shutil.copy(path, tr_dir)
        shutil.copy(os.path.join(full, base + ".txt"), tr_dir)
        tg = os.path.join(full, "textgrids", base + ".TextGrid")
        if os.path.exists(tg):
            shutil.copy(tg, tg_dir)
    meta = {
        "epochs": epochs,
        "va_idx": [int(i) for i in s.va_idx],
        "val_wavs": [os.path.basename(wavs[w]) for w in sorted(va)],
        "final_quality": {k: round(float(v), 3)
                          for k, v in s.trainer.last_quality.items()},
    }
    with open(os.path.join(work, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print("phase train done:", work, flush=True)


# ---------------------------------------------------------------------------
# phase: fine-tune (subprocess per arm — default platform, i.e. TPU)
# ---------------------------------------------------------------------------

def run_finetune(work: str, baseline_gen: str, steps: int, gta: bool,
                 config: str, batch_size: int, segment_frames: int,
                 resume_state: str = None, disc_warmup: int = 0) -> str:
    name = "gta_ft" if gta else "control_ft"
    if resume_state:
        name += "_rs"  # full-state arms: aligned discriminators, own dirs
    out = os.path.join(work, "checkpoints", name, f"gen_{steps:08d}.spev")
    if os.path.exists(out):
        print(f"{name}: exists, skipping")
        return out
    cmd = [sys.executable, "-m", "spev_tpu.cli.vocoder",
           "--data_dir", os.path.join(work, "corpus_train"),
           "--textgrid_dir", os.path.join(work, "corpus_train", "textgrids"),
           "--cache_dir", os.path.join(work, f"cache_voc_{name}"),
           "--config", config,
           "--steps", str(steps), "--batch_size", str(batch_size),
           "--segment_frames", str(segment_frames),
           "--log_every", "200", "--save_every", str(steps),
           "--name", name]
    if resume_state:
        # resume generator + DISCRIMINATORS + optimizer states: the arms
        # keep the adversarial equilibrium instead of restarting D
        # (which costs ~4 dB copy-synthesis for thousands of steps —
        # docs/QUALITY.md)
        cmd += ["--resume_state", resume_state]
    else:
        cmd += ["--finetune_from", baseline_gen]
        if disc_warmup:
            cmd += ["--disc_warmup", str(disc_warmup)]
    if gta:
        cmd += ["--gta_checkpoint", os.path.join(work, "acoustic.spev")]
    print("run:", " ".join(cmd), flush=True)
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(cmd, check=True, cwd=work, env=env)
    return out


# ---------------------------------------------------------------------------
# phase: eval (default platform)
# ---------------------------------------------------------------------------

def phase_eval(work: str, baseline_gen: str, gens: dict, out_path: str,
               config: str, wav_dir: str = None) -> dict:
    import numpy as np

    from spev_tpu.config import AudioConfig
    from spev_tpu.data.dataset import FeatureExtractor, SpevDataset
    from spev_tpu.diag.quality import mel_cepstral_distortion
    from spev_tpu.infer.gta import compute_gta_mels
    from spev_tpu.infer.vocoder import Vocoder
    from spev_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
    from spev_tpu.train.checkpoint import load_params
    from spev_tpu.utils.wavio import read_wav, write_wav

    with open(os.path.join(work, "meta.json")) as f:
        meta = json.load(f)
    ds = SpevDataset(os.path.join(work, "corpus"),
                     textgrid_dir=os.path.join(work, "corpus", "textgrids"),
                     cache_dir=os.path.join(work, "cache_eval"),
                     g2p_backend="rules", stats_sample=60)
    acoustic = os.path.join(work, "acoustic.spev")
    pred_mels = compute_gta_mels(acoustic, ds)

    gcfg = HiFiGANConfig() if config == "v1" else HiFiGANConfig.v3()
    vocs = {}
    for arm, path in {"baseline": baseline_gen, **gens}.items():
        params, _, _ = load_params(path)
        vocs[arm] = Vocoder(generator=HiFiGANGenerator(gcfg, params))

    fx = FeatureExtractor(AudioConfig(), use_pallas=False)
    audio_sr = AudioConfig().sample_rate
    all_wavs = sorted(glob.glob(os.path.join(work, "corpus", "**", "*.wav"),
                                recursive=True))
    results = {arm: {"pred_mcd": [], "copy_mcd": []} for arm in vocs}
    rows = {}
    for j, idx in enumerate(meta["va_idx"]):
        w = int(re.match(r"u_(\d+)\.npz$", ds.files[idx]).group(1))
        y_gt, _sr = read_wav(all_wavs[w])
        mel_gt = np.asarray(fx.mel(y_gt), np.float32).T
        row = {}
        for arm, voc in vocs.items():
            wav_pred = np.asarray(voc.infer(pred_mels[idx]))
            wav_copy = np.asarray(voc.infer(mel_gt))
            mcd_p = float(mel_cepstral_distortion(
                np.asarray(fx.mel(wav_pred), np.float32).T, mel_gt))
            mcd_c = float(mel_cepstral_distortion(
                np.asarray(fx.mel(wav_copy), np.float32).T, mel_gt))
            results[arm]["pred_mcd"].append(mcd_p)
            results[arm]["copy_mcd"].append(mcd_c)
            row[arm] = {"pred_mcd_db": round(mcd_p, 2),
                        "copy_mcd_db": round(mcd_c, 2)}
            if wav_dir and j < 3:
                os.makedirs(wav_dir, exist_ok=True)
                write_wav(os.path.join(wav_dir, f"val{j}_predmel_{arm}.wav"),
                          np.clip(wav_pred, -1, 1), audio_sr)
        rows[f"val{j}"] = row
        print(f"val{j}: " + "  ".join(
            f"{arm} pred {row[arm]['pred_mcd_db']} / copy "
            f"{row[arm]['copy_mcd_db']} dB" for arm in vocs), flush=True)

    import statistics

    summary = {arm: {k: round(statistics.mean(v), 2)
                     for k, v in results[arm].items()}
               for arm in results}
    out = {"summary_mean_mcd_db": summary, "per_utterance": rows,
           "n_val": len(meta["va_idx"]), "acoustic": meta["final_quality"]}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary, indent=1))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline_gen", required=True,
                    help="gen_*.spev trained on ground-truth mels")
    ap.add_argument("--config", default="v3", choices=["v1", "v3"])
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--segment_frames", type=int, default=32)
    ap.add_argument("--work", default="/root/gta_demo")
    ap.add_argument("--out", default="docs/demo/gta_metrics.json")
    ap.add_argument("--wav_dir", default=None,
                    help="also write val{j}_predmel_{arm}.wav here")
    ap.add_argument("--resume_state", default=None,
                    help="state_latest.spev matching --baseline_gen: both "
                         "fine-tune arms resume the FULL GAN state (aligned "
                         "discriminators + optimizer) instead of a "
                         "generator-only warm start with fresh Ds")
    ap.add_argument("--disc_warmup", type=int, default=0,
                    help="generator-only warm start: freeze G for N steps "
                         "while fresh Ds catch up (ignored with "
                         "--resume_state)")
    ap.add_argument("--phase", default="all",
                    choices=["all", "train", "finetune", "eval"])
    args = ap.parse_args()
    os.makedirs(args.work, exist_ok=True)

    if args.phase == "train":
        phase_train(args.work, args.epochs)
        return

    if not os.path.exists(os.path.join(args.work, "acoustic.spev")):
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--baseline_gen", args.baseline_gen,
                        "--phase", "train", "--work", args.work,
                        "--epochs", str(args.epochs)], check=True)
    else:
        print("phase train: exists, skipping")

    rs = os.path.abspath(args.resume_state) if args.resume_state else None
    gens = {}
    if args.phase in ("all", "finetune"):
        for arm, gta in [("gta", True), ("control", False)]:
            gens[arm] = run_finetune(args.work, os.path.abspath(args.baseline_gen),
                                     args.steps, gta, args.config,
                                     args.batch_size, args.segment_frames,
                                     resume_state=rs,
                                     disc_warmup=args.disc_warmup)
    else:
        suffix = "_rs" if rs else ""
        for arm, name in [("gta", "gta_ft"), ("control", "control_ft")]:
            gens[arm] = os.path.join(args.work, "checkpoints", name + suffix,
                                     f"gen_{args.steps:08d}.spev")
    if args.phase == "finetune":
        return

    phase_eval(args.work, os.path.abspath(args.baseline_gen), gens, args.out,
               args.config, wav_dir=args.wav_dir)


if __name__ == "__main__":
    main()
