"""Reconstructed core CLI (the documented-but-absent ``spev_tts.py``,
SURVEY.md §2.9): two-phase training (``--warmup_epochs`` trains duration
only), inference with duration/pitch scales.  Console scripts:
``spev-train`` (main) and ``spev-infer`` (inference_mode)."""

from __future__ import annotations

import argparse

from spev_tpu.cli.common import add_cache_flags, cli_guard, run_training, write_outputs


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="spev-tts")
    p.add_argument("--mode", type=str, default="train", choices=["train", "infer"])
    p.add_argument("--data_dir", type=str, default="data/training_data")
    p.add_argument("--textgrid_dir", type=str, default="data/textgrid_data")
    p.add_argument("--hifigan_dir", type=str, default="hifi-gan")
    p.add_argument("--name", type=str, default="spev_tts")
    p.add_argument("--resume", type=str)
    add_cache_flags(p)
    p.add_argument("--save_every", type=int, default=10,
                   help="epochs between resumable `last` checkpoints and "
                        "val plots (the final epoch always saves; `best` "
                        "saves params-only on every improvement) - the "
                        "checkpoint fetch dominates epoch wall time on "
                        "tunneled devices")
    p.add_argument("--warmup_epochs", type=int, default=10,
                   help="duration-only epochs before full training")
    p.add_argument("--multi_speaker", action="store_true",
                   help="derive speaker labels from filename prefixes "
                        "(LibriTTS-R convention: {speaker}_*.wav) and train "
                        "a speaker embedding — the multi-speaker stretch "
                        "config")
    p.add_argument("--reference_predictors", action="store_true",
                   help="keep the reference's LayerNorm(1) constant-output "
                        "variance predictors (checkpoint-parity mode); by "
                        "default this CLI trains functional per-phoneme "
                        "predictors (vp_output_norm=False)")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--warmup_steps", type=int, default=None,
                   help="LR warmup steps (default: TrainConfig's 4000; set "
                        "~5%% of total steps on small corpora)")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--checkpoint", type=str, default="checkpoints/spev_tts/best.spev")
    p.add_argument("--text", type=str, default="Hello from SPEV.")
    p.add_argument("--duration_scale", type=float, default=1.0)
    p.add_argument("--pitch_scale", type=float, default=1.0)
    p.add_argument("--output", type=str, default="output.wav")
    return p


@cli_guard
def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.mode == "train":
        run_training(
            args,
            warmup_epochs=args.warmup_epochs,
            model_overrides=None if args.reference_predictors else {"vp_output_norm": False},
        )
    else:
        inference_mode(args)


@cli_guard
def inference_mode(args=None, argv=None) -> None:
    if args is None:
        args = build_parser().parse_args(argv)
    from spev_tpu.infer.synthesis import infer_tts

    wav, mel = infer_tts(
        args.checkpoint,
        args.text,
        duration_scale=args.duration_scale,
        pitch_scale=args.pitch_scale,
        hifigan_dir=args.hifigan_dir,
    )
    write_outputs(wav, mel, args.output)


if __name__ == "__main__":
    main()
