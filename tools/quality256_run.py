"""Round-5 quality push: full-size acoustic model + long GAN + GTA scoring.

VERDICT r4 #2: the documented quality bar (reference
``PRODUCTION_SYSTEM_SUMMARY.md:227-231``: MCD < 6.0 dB, duration error
< 10%) has never been demonstrated at full scale.  This runner drives the
round-5 attempt on the strongest offline proxy (no network → no LJSpeech):

- a 480-utterance formant corpus (4x the calibrated docs/QUALITY.md
  dashboard corpus — hidden-256 needs the extra data to generalize);
- the FULL-SIZE acoustic model (hidden 256, 4+4 FFT blocks, six
  predictors, ``vp_output_norm=False`` — the "fixed" mode; the parity
  LayerNorm(1) quirk pins predictors to constants, docs/QUALITY.md);
- teacher-forced eval on the held-out split (`infer/evaluate.py`), then —
  with a `spev-vocoder-train` generator — the serving-condition and
  copy-synthesis scores that docs/QUALITY.md reports.

Phases (resumable; each skips itself if its artifact exists under --work):

  corpus   generate wavs+TextGrids, build the feature cache (host-side)
  train    N epochs on the default JAX platform (TPU when alive)
  eval     teacher-forced val MCD / duration error  -> work/eval_tf.json
  score    requires --gen (gen_*.spev): serving-condition vocoded MCD +
           F0 RMSE (`evaluate_checkpoint(vocoder=...)`) and copy-synthesis
           MCD on the val utterances                -> work/score.json

The vocoder itself trains separately (it is the long pole — run it while
`train`/`eval` finish):

  python -m spev_tpu.cli.vocoder --data_dir <work>/corpus --name q256gan \
      --config v3 --steps 60000 --batch_size 16 --save_every 2000
  # then GTA fine-tune (docs/QUALITY.md): --gta_checkpoint <work>/ck/best.spev \
  #     --textgrid_dir <work>/corpus/textgrids --finetune_from gen_*.spev

Usage:
  timeout 3600 python tools/quality256_run.py corpus train eval \
      [--work /root/q5work] [--epochs 400]
  timeout 1800 python tools/quality256_run.py score --gen checkpoints/q256gan/gen_00060000.spev
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_UTTS = 480
VAL_FRAC = 0.1
SEED = 0


def build_dataset(work: str):
    from spev_tpu.data.dataset import SpevDataset

    root = os.path.join(work, "corpus")
    return SpevDataset(root, textgrid_dir=os.path.join(root, "textgrids"),
                       cache_dir=os.path.join(work, "cache"),
                       g2p_backend="rules", stats_sample=120)


def phase_corpus(work: str) -> None:
    root = os.path.join(work, "corpus")
    if os.path.exists(os.path.join(work, "cache", "metadata.json")):
        print("[corpus] cache exists, skipping", flush=True)
        return
    from spev_tpu.data.synthetic import generate_formant_corpus

    t0 = time.time()
    generate_formant_corpus(root, n_utterances=N_UTTS, seed=SEED)
    build_dataset(work)
    print(f"[corpus] built {N_UTTS} utts + cache in {time.time() - t0:.0f}s",
          flush=True)


def make_cfg(vocab_size: int, epochs: int, lr: float = 1e-3,
             warmup_steps: int = 500):
    from spev_tpu.config import ModelConfig, SpevConfig, TrainConfig

    return SpevConfig(
        model=ModelConfig(vocab_size=vocab_size, embed_dim=256, hidden_dim=256,
                          n_mels=80, max_phonemes=32, max_frames=256,
                          vp_output_norm=False),
        train=TrainConfig(batch_size=16, warmup_steps=warmup_steps,
                          epochs=epochs, warmup_epochs=2, learning_rate=lr),
    )


def phase_train(work: str, epochs: int, lr: float = 1e-3,
                warmup_steps: int = 500) -> None:
    best = os.path.join(work, "ck", "best.spev")
    done = os.path.join(work, "train_done.json")
    if os.path.exists(done):
        print("[train] already done, skipping", flush=True)
        return
    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from spev_tpu.data.batching import BucketBatcher, train_val_split
    from spev_tpu.text.vocab import Vocab
    from spev_tpu.train.trainer import Trainer

    ds = build_dataset(work)
    vocab = Vocab(ds.vocab)
    cfg = make_cfg(len(vocab), epochs, lr=lr, warmup_steps=warmup_steps)
    tr_idx, va_idx = train_val_split(len(ds), VAL_FRAC, seed=SEED)
    trainer = Trainer(cfg, vocab, ds.stats, ckpt_dir=os.path.join(work, "ck"),
                      log_dir=os.path.join(work, "logs"))
    bt = BucketBatcher(ds, vocab, batch_size=16, phoneme_buckets=(32,),
                       frame_buckets=(256,), indices=tr_idx)
    bv = BucketBatcher(ds, vocab, batch_size=16, phoneme_buckets=(32,),
                       frame_buckets=(256,), indices=va_idx)
    log_path = os.path.join(work, "train_log.jsonl")
    t0, last_row = time.time(), {}
    with open(log_path, "a") as log:
        for epoch in range(epochs):
            m = trainer.train_epoch(bt.epoch(epoch))
            # validation every 5 epochs: each val costs host transfers
            # through the relay; the trajectory is what matters, not
            # per-epoch resolution (round-4 cadence lesson, d994a09)
            if epoch % 5 == 0 or epoch == epochs - 1:
                val = trainer.validate(bv.epoch(0))
                trainer.maybe_save_best(val)
                q = trainer.last_quality
                last_row = {
                    "epoch": epoch, "loss": round(float(m["train_loss"]), 4),
                    "val": round(float(val), 4),
                    "mcd": round(float(q.get("val_mcd_db", float("nan"))), 2),
                    "durerr": round(float(q.get("val_dur_err_pct", float("nan"))), 2),
                    "wall_s": round(time.time() - t0, 1),
                }
                log.write(json.dumps(last_row) + "\n")
                log.flush()
                print(last_row, flush=True)
            if epoch and epoch % 100 == 0:
                trainer.save("last")  # resumable safety net
    trainer.save("last")
    with open(done, "w") as f:
        json.dump(last_row, f)
    # the in-repo path the advanced-controls demo and QUALITY.md reference
    os.makedirs("checkpoints/q256", exist_ok=True)
    shutil.copy(best, "checkpoints/q256/best.spev")
    print(f"[train] done in {time.time() - t0:.0f}s; best -> "
          "checkpoints/q256/best.spev", flush=True)


def _val_indices(ds):
    from spev_tpu.data.batching import train_val_split

    _, va_idx = train_val_split(len(ds), VAL_FRAC, seed=SEED)
    return va_idx


def phase_eval(work: str) -> None:
    out = os.path.join(work, "eval_tf.json")
    if os.path.exists(out):
        print("[eval] exists, skipping", flush=True)
        return
    from spev_tpu.infer.evaluate import evaluate_checkpoint

    ds = build_dataset(work)
    res = evaluate_checkpoint(os.path.join(work, "ck", "best.spev"), ds,
                              indices=_val_indices(ds), batch_size=16,
                              phoneme_buckets=(32,), frame_buckets=(256,))
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("[eval] aggregate:", json.dumps(res["aggregate"]), flush=True)


def phase_score(work: str, gen: str, tag: str = "score") -> None:
    """Serving-condition (vocoded) eval + copy-synthesis MCD with a
    trained GAN generator."""
    out = os.path.join(work, f"{tag}.json")
    from spev_tpu.config import AudioConfig
    from spev_tpu.data.dataset import FeatureExtractor
    from spev_tpu.diag.quality import mel_cepstral_distortion
    from spev_tpu.infer.evaluate import evaluate_checkpoint
    from spev_tpu.infer.vocoder import Vocoder
    from spev_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
    from spev_tpu.train.checkpoint import load_params
    from spev_tpu.utils.wavio import read_wav

    import numpy as np

    params, _, _ = load_params(gen)
    voc = Vocoder(generator=HiFiGANGenerator(HiFiGANConfig.v3(), params))
    ds = build_dataset(work)
    va_idx = _val_indices(ds)
    res = evaluate_checkpoint(os.path.join(work, "ck", "best.spev"), ds,
                              indices=va_idx, batch_size=16,
                              phoneme_buckets=(32,), frame_buckets=(256,),
                              vocoder=voc)
    # copy-synthesis on the same val utterances (vocoder-only metric).
    # dataset index -> source wav via the cache naming contract
    # (u_{w}.npz <-> sorted wav glob; same mapping as tools/gta_demo.py:80-90)
    import glob
    import re

    all_wavs = sorted(glob.glob(os.path.join(work, "corpus", "*.wav")))
    fx = FeatureExtractor(AudioConfig(), use_pallas=False)
    cs = []
    for i in va_idx:
        w = int(re.match(r"u_(\d+)\.npz$", ds.files[i]).group(1))
        y, _sr = read_wav(all_wavs[w])
        mel = fx.full_features(y)[0].T
        wav_gan = np.asarray(voc.infer(mel))
        mel_gan = fx.full_features(wav_gan[: len(y)])[0].T
        T = min(len(mel), len(mel_gan))
        cs.append(float(mel_cepstral_distortion(mel_gan[:T], mel[:T])))
    res["copy_synthesis"] = {
        "mcd_db_mean": round(float(np.mean(cs)), 3),
        "mcd_db_median": round(float(np.median(cs)), 3),
        "per_utterance": [round(v, 3) for v in cs],
        "generator": gen,
    }
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print("[score] aggregate:", json.dumps(res["aggregate"]), flush=True)
    print("[score] copy-synthesis:",
          json.dumps({k: v for k, v in res["copy_synthesis"].items()
                      if k != "per_utterance"}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("phases", nargs="+",
                    choices=["corpus", "train", "eval", "score"])
    ap.add_argument("--work", default="/root/q5work")
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--lr", type=float, default=1e-3,
                    help="hidden-256 diverges at the hidden-96 dashboard's "
                         "2e-3 (measured: val 0.88@5 -> 1.05@150); 1e-3 "
                         "is the full-size default")
    ap.add_argument("--warmup_steps", type=int, default=500)
    ap.add_argument("--gen", default=None, help="gen_*.spev for score")
    ap.add_argument("--tag", default="score", help="score output name")
    args = ap.parse_args()
    # the axon sitecustomize overrides jax_platforms at interpreter start;
    # an explicit JAX_PLATFORMS env (cpu for the host-side corpus phase)
    # must be re-applied in code before backend init (same recipe as
    # bench.py / tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    os.makedirs(args.work, exist_ok=True)
    for ph in args.phases:
        if ph == "corpus":
            phase_corpus(args.work)
        elif ph == "train":
            phase_train(args.work, args.epochs, lr=args.lr,
                        warmup_steps=args.warmup_steps)
        elif ph == "eval":
            phase_eval(args.work)
        elif ph == "score":
            if not args.gen:
                sys.exit("score needs --gen")
            phase_score(args.work, args.gen, args.tag)


if __name__ == "__main__":
    main()
