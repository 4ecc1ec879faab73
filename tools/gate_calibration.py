"""Calibrate (and adversarially validate) the tests/test_convergence.py gate.

Runs the EXACT CI fixture setup (tests/conftest.py env: 8 virtual CPU
devices) for 45 epochs and prints the gate metrics as one JSON line:

- mcd0 / mcd_final (median of last 5) / ratio — the MCD bound inputs;
- durerr_final (median of last 3);
- freerun_frame_err_pct — FREE-RUNNING inference (predicted durations,
  no teacher forcing) on every held-out utterance: median relative
  |predicted − gt| frame-count error.  The duration predictor's
  generalization, not its teacher-forced fit;
- the convergence-trend medians.

``--lr_mult`` perturbs the learning rate: the gate is only trustworthy if
a deliberate 10% perturbation (``--lr_mult 1.1``) measurably degrades a
bounded metric past its limit (docs/QUALITY.md records the proof run).

Usage:
  timeout 1800 python tools/gate_calibration.py [--epochs 45] [--lr_mult 1.0]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def freerun_frame_errors(trainer, ds, vocab, cfg, va_idx) -> list:
    """Free-running frame-count error per held-out utterance (%)."""
    from spev_tpu.infer.synthesis import Synthesizer

    ckpt = trainer.save("gate_cal", include_opt=False)
    synth = Synthesizer(ckpt, hifigan_dir=None, model_cfg=cfg.model,
                        g2p_backend="rules",
                        phoneme_buckets=(32,), frame_buckets=(256,))
    errs = []
    for idx in va_idx:
        with np.load(os.path.join(ds.cache_dir, ds.files[idx]),
                     allow_pickle=True) as u:
            phs = [str(p) for p in u["phs"]]
            gt = int(np.asarray(u["mel"]).shape[0])
        ids = synth.phonemes_to_ids(phs)
        _, mel = synth.synthesize_ids(ids)
        errs.append(abs(len(mel) - gt) / gt * 100.0)
    return errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=45)
    ap.add_argument("--lr_mult", type=float, default=1.0)
    args = ap.parse_args()

    from tools.demo_common import build_quality_setup

    s = build_quality_setup(args.epochs, lr_mult=args.lr_mult)
    hist = []
    for epoch in range(args.epochs):
        m = s.trainer.train_epoch(s.bt.epoch(epoch))
        val = s.trainer.validate(s.bv.epoch(0))
        q = s.trainer.last_quality
        hist.append({"loss": float(m["train_loss"]), "val": float(val),
                     "mcd": float(q.get("val_mcd_db", np.nan)),
                     "durerr": float(q.get("val_dur_err_pct", np.nan))})
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            print(f"# epoch {epoch}: val {val:.3f} mcd {hist[-1]['mcd']:.1f} "
                  f"durerr {hist[-1]['durerr']:.1f}%", file=sys.stderr, flush=True)

    errs = freerun_frame_errors(s.trainer, s.ds, s.vocab, s.cfg, s.va_idx)
    k = len(hist) // 3
    med = lambda key, rows: float(np.median([h[key] for h in rows]))
    print(json.dumps({
        "epochs": args.epochs,
        "lr_mult": args.lr_mult,
        "mcd0": hist[0]["mcd"],
        "mcd_final_med5": med("mcd", hist[-5:]),
        "mcd_ratio": med("mcd", hist[-5:]) / hist[0]["mcd"],
        "durerr_final_med3": med("durerr", hist[-3:]),
        "freerun_frame_err_pct_median": float(np.median(errs)),
        "freerun_frame_err_pct_max": float(np.max(errs)),
        "trend": {key: [med(key, hist[:k]), med(key, hist[-k:])]
                  for key in ("mcd", "durerr", "val")},
    }), flush=True)


if __name__ == "__main__":
    main()
