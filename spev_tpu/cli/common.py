"""Shared CLI plumbing: training loop driver, synthesis output writing,
and the user-error guard that turns expected failures into clean exits."""

from __future__ import annotations

import functools
import os
import sys
from typing import Optional

import numpy as np


def cli_guard(fn):
    """Print expected user errors as a single ``error: ...`` line and exit
    2 instead of dumping a traceback.

    Caught: FileNotFoundError/NotADirectoryError (bad paths) and
    `spev_tpu.errors.UserError` (bad flag values / malformed inputs).
    Internal bugs — including plain ValueErrors from deep inside JAX
    graphs — propagate with their full traceback.  Set ``SPEV_TRACEBACK=1``
    to see the traceback even for user errors."""
    from spev_tpu.errors import UserError

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (FileNotFoundError, NotADirectoryError, UserError) as e:
            if os.environ.get("SPEV_TRACEBACK"):
                raise
            print(f"error: {e}", file=sys.stderr)
            print("(set SPEV_TRACEBACK=1 for the full traceback)", file=sys.stderr)
            raise SystemExit(2)

    return wrapper


def add_cache_flags(p) -> None:
    """Dataset-cache flags shared by the training CLIs.  ``--force_rebuild``
    reproduces the reference's delete-cache-per-construction default
    (`/root/reference/spev_real_metrics.py:283-289`); here rebuilds are
    opt-in because the cache is the expensive one-time pass."""
    p.add_argument("--cache_dir", type=str, default="cache_spev",
                   help="feature-cache directory (npz + metadata.json)")
    p.add_argument("--force_rebuild", action="store_true",
                   help="delete and rebuild the feature cache (the "
                        "reference's default behavior)")


def run_training(args, warmup_epochs: int = 0, model_overrides: Optional[dict] = None) -> None:
    """Shared train driver for the real_metrics / spev_tts / spev_advanced
    CLIs: dataset build → 95/5 split → bucketed batches → Trainer epochs
    with validation, last/best checkpoints and test-inference probes."""
    from spev_tpu.config import SpevConfig, ModelConfig, TrainConfig
    from spev_tpu.data.batching import BucketBatcher, train_val_split
    from spev_tpu.data.dataset import SpevDataset
    from spev_tpu.diag import log_metrics, test_inference_probe
    from spev_tpu.text.vocab import Vocab
    from spev_tpu.train.trainer import Trainer

    multi_speaker = bool(getattr(args, "multi_speaker", False))
    emotion_labels = bool(getattr(args, "emotion_labels", False))
    ds = SpevDataset(
        args.data_dir,
        textgrid_dir=getattr(args, "textgrid_dir", None),
        cache_dir=getattr(args, "cache_dir", "cache_spev"),
        force_rebuild=getattr(args, "force_rebuild", False),
        multi_speaker=multi_speaker,
        emotion_vad=emotion_labels,
    )
    if emotion_labels and getattr(ds, "emotions", None):
        print(f"Emotion-VAD labels: {', '.join(ds.emotions)}")
    vocab = Vocab(ds.vocab)
    print(f"Dataset: {len(ds)} utterances, vocab {len(vocab)}")

    model_overrides = dict(model_overrides or {})
    if multi_speaker:
        # speaker table sized from the corpus labels (basename prefixes);
        # batches then carry speaker_ids and the trainer routes through
        # the advanced wrapper's speaker embedding
        model_overrides.setdefault("n_speakers", max(2, len(ds.speakers)))
        print(f"Multi-speaker: {len(ds.speakers)} speakers "
              f"({', '.join(ds.speakers[:8])}{'…' if len(ds.speakers) > 8 else ''})")

    train_kw = {}
    if getattr(args, "warmup_steps", None) is not None:
        # the TrainConfig default (4000) is LJSpeech-scale; on a small
        # corpus a whole run can fit inside it and never reach peak LR
        # (round-4 q256: 1200 steps, LR still ramping at the end)
        train_kw["warmup_steps"] = int(args.warmup_steps)
    cfg = SpevConfig(
        model=ModelConfig(vocab_size=len(vocab), **model_overrides),
        train=TrainConfig(
            learning_rate=args.lr,
            batch_size=args.batch_size,
            grad_accum=getattr(args, "grad_accum", 1),
            epochs=args.epochs,
            warmup_epochs=warmup_epochs,
            **train_kw,
        ),
    )
    tr_idx, va_idx = train_val_split(len(ds), cfg.train.val_fraction, seed=cfg.train.seed)
    print(f"Dataset: {len(tr_idx)} Train, {len(va_idx)} Val")
    train_b = BucketBatcher(ds, vocab, batch_size=cfg.train.batch_size, indices=tr_idx)
    val_b = BucketBatcher(ds, vocab, batch_size=cfg.train.batch_size, indices=va_idx)

    trainer = Trainer(
        cfg, vocab, ds.stats,
        ckpt_dir=os.path.join("checkpoints", args.name),
        log_dir=os.path.join("logs", args.name),
    )
    if getattr(args, "resume", None):
        print(f"Resuming from {args.resume}")
        trainer.restore(args.resume)

    # per-epoch artifact cadence: the resumable `last` (params+optimizer,
    # ~3x the params bytes) and the val mel plot are throttled — on a
    # tunneled/remote device the checkpoint fetch alone can exceed the
    # whole epoch's train compute on a small corpus.  `best` still saves
    # on every improvement, params-only (Trainer.maybe_save_best).
    save_every = max(1, int(getattr(args, "save_every", 10) or 10))
    for epoch in range(trainer.epoch, cfg.train.epochs):
        metrics = trainer.train_epoch(train_b.epoch(epoch))
        cadence = (epoch + 1) % save_every == 0 or epoch + 1 == cfg.train.epochs
        val_loss = trainer.validate(val_b.epoch(0),
                                    save_plot_epoch=epoch if cadence else None)
        quality = getattr(trainer, "last_quality", {}) or {}
        log_metrics(trainer.log_dir, epoch, {**metrics, "val_mel": val_loss, **quality})
        qstr = ""
        if "val_mcd_db" in quality:
            qstr = f" | MCD {quality['val_mcd_db']:.2f} dB"
            if "val_dur_err_pct" in quality:
                qstr += f" | dur err {quality['val_dur_err_pct']:.1f}%"
        print(
            f"Epoch {epoch + 1}: train {metrics['train_loss']:.4f} | val mel {val_loss:.4f}{qstr}"
        )
        if cadence:
            trainer.save("last")
        if trainer.maybe_save_best(val_loss):
            print(f"New best model saved (val {val_loss:.4f})")
        if (epoch + 1) % 10 == 0:
            # documented reference variant: numbered checkpoints every 10
            # epochs (README.md:157) + synthesis probes; params-only (the
            # resumable state lives in `last`)
            trainer.save(f"ckpt_{epoch + 1}", include_opt=False)
            test_inference_probe(trainer, log_dir=trainer.log_dir, epoch=epoch)


def write_outputs(wav: np.ndarray, mel: np.ndarray, output: str, sr: int = 22050) -> None:
    """Write the waveform and a mel PNG next to it (the reference's infer
    behavior, ``spev_real_metrics.py:827-840``)."""
    from spev_tpu.utils.wavio import write_wav
    from spev_tpu.diag import save_mel_plot

    write_wav(output, wav, sr)
    print(f"Audio saved to {output}")
    png = os.path.splitext(output)[0] + "_mel.png"
    save_mel_plot(mel.T, png, title="Generated Mel Spectrogram")
    print(f"Mel spectrogram saved to {png}")
