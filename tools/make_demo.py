"""Generate the committed audio demo (docs/demo/): train the synthetic
formant corpus to convergence, then synthesize held-out utterances.

The env has no network, so LJSpeech and the upstream HiFi-GAN checkpoint
are unreachable; the strongest offline evidence that the full pipeline
produces *audio that tracks its targets* is: train on the synthetic corpus
(docs/QUALITY.md setup), synthesize VALIDATION utterances from their
phoneme sequences, and commit ground-truth vs synthesized wav + mel pairs.

Usage:  timeout 3600 python tools/make_demo.py [epochs] [out_dir] \
            [--gan_checkpoint gen_*.spev [--gan_config v3]]
Writes: {utt}_gt.wav, {utt}_synth.wav, {utt}_mels.png per demo utterance
        + demo_metrics.json (per-utterance MCD, final val dashboard);
        with --gan_checkpoint also {utt}_synth_gan.wav — the full
        pipeline (trained acoustic model, free-running durations → the
        in-framework-trained GAN vocoder).
"""

import glob
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# same env as docs/QUALITY.md (8 virtual CPU devices)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tools.demo_common import build_quality_setup  # noqa: E402
from spev_tpu.diag.plots import save_comparison_plot  # noqa: E402
from spev_tpu.diag.quality import mel_cepstral_distortion  # noqa: E402
from spev_tpu.utils.wavio import write_wav  # noqa: E402


def main(epochs: int = 150, out_dir: str = "docs/demo",
         gan_checkpoint: str = None, gan_config: str = "v3") -> None:
    gan_voc = None
    if gan_checkpoint:
        from spev_tpu.infer.vocoder import Vocoder
        from spev_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
        from spev_tpu.train.checkpoint import load_params

        params, _, _ = load_params(gan_checkpoint)
        gcfg = HiFiGANConfig() if gan_config == "v1" else HiFiGANConfig.v3()
        gan_voc = Vocoder(generator=HiFiGANGenerator(gcfg, params))
    s = build_quality_setup(epochs)
    ds, trainer, va_idx = s.ds, s.trainer, s.va_idx
    root, cfg = s.corpus_root, s.cfg
    for epoch in range(epochs):
        m = trainer.train_epoch(s.bt.epoch(epoch))
        val = trainer.validate(s.bv.epoch(0))
        if epoch % 10 == 0 or epoch == epochs - 1:
            q = trainer.last_quality
            print(f"epoch {epoch}: loss {m['train_loss']:.3f} val {val:.3f} "
                  f"MCD {q.get('val_mcd_db', float('nan')):.1f} "
                  f"durerr {q.get('val_dur_err_pct', float('nan')):.1f}%",
                  flush=True)
    ckpt = trainer.save("demo")

    # --- synthesize held-out utterances from their phoneme sequences ------
    from spev_tpu.infer.synthesis import Synthesizer

    synth = Synthesizer(ckpt, hifigan_dir=None, model_cfg=cfg.model,
                        g2p_backend="rules",
                        phoneme_buckets=(32,), frame_buckets=(256,))
    os.makedirs(out_dir, exist_ok=True)
    metrics = {"final_quality": {k: round(float(v), 2)
                                 for k, v in trainer.last_quality.items()},
               "epochs": epochs, "utterances": {}}
    for j, idx in enumerate(va_idx[:3]):
        with np.load(os.path.join(ds.cache_dir, ds.files[idx]),
                     allow_pickle=True) as u:
            phs = [str(p) for p in u["phs"]]
            mel_gt = np.asarray(u["mel"])
        ids = synth.phonemes_to_ids(phs)
        wav, mel = synth.synthesize_ids(ids)
        name = f"val{j}"
        # ground truth audio: the corpus wav itself.  ds.files[idx] is
        # 'u_{i:05d}.npz' where i indexes the dataset's SORTED RECURSIVE
        # wav glob — pairing by position among surviving entries would
        # silently mismatch gt and synth whenever any utterance is skipped
        wav_i = int(re.match(r"u_(\d+)\.npz$", ds.files[idx]).group(1))
        all_wavs = sorted(glob.glob(os.path.join(os.path.abspath(root),
                                                 "**", "*.wav"), recursive=True))
        src_wav = all_wavs[wav_i]
        shutil.copy(src_wav, os.path.join(out_dir, f"{name}_gt.wav"))
        write_wav(os.path.join(out_dir, f"{name}_synth.wav"),
                  np.clip(wav, -1, 1), synth.audio.sample_rate)
        if gan_voc is not None:
            wav_gan = np.asarray(gan_voc.infer(mel))
            write_wav(os.path.join(out_dir, f"{name}_synth_gan.wav"),
                      np.clip(wav_gan, -1, 1), synth.audio.sample_rate)
        save_comparison_plot(mel_gt, mel, os.path.join(out_dir, f"{name}_mels.png"))
        T = min(len(mel), len(mel_gt))
        mcd = float(mel_cepstral_distortion(mel[:T], mel_gt[:T]))
        metrics["utterances"][name] = {
            "phonemes": len(phs), "frames_pred": int(len(mel)),
            "frames_gt": int(len(mel_gt)), "mcd_db_vs_gt": round(mcd, 2),
        }
        print(f"{name}: {len(phs)} phonemes -> {len(mel)} frames "
              f"(gt {len(mel_gt)}), MCD {mcd:.2f} dB", flush=True)
    with open(os.path.join(out_dir, "demo_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print("demo written to", out_dir)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("epochs", nargs="?", type=int, default=150)
    ap.add_argument("out_dir", nargs="?", default="docs/demo")
    ap.add_argument("--gan_checkpoint", default=None,
                    help="gen_*.spev from spev-vocoder-train; also writes "
                         "{utt}_synth_gan.wav (full trained pipeline)")
    ap.add_argument("--gan_config", default="v3", choices=["v1", "v3"])
    a = ap.parse_args()
    main(a.epochs, a.out_dir, gan_checkpoint=a.gan_checkpoint,
         gan_config=a.gan_config)
