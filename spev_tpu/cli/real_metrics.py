"""CLI of the surviving reference engine (``spev_real_metrics.py:789-840``):
``python -m spev_tpu.cli.real_metrics --mode train|infer [flags]`` with the
exact flag surface."""

from __future__ import annotations

import argparse

from spev_tpu.cli.common import add_cache_flags, cli_guard, run_training, write_outputs


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="spev-real-metrics")
    p.add_argument("--mode", type=str, required=True, choices=["train", "infer"])
    p.add_argument("--data_dir", type=str, default="data")
    p.add_argument("--textgrid_dir", type=str, help="Path to MFA .TextGrid files")
    p.add_argument("--name", type=str, default="run_stable")
    add_cache_flags(p)
    p.add_argument("--save_every", type=int, default=10,
                   help="epochs between resumable `last` checkpoints and "
                        "val plots (the final epoch always saves; `best` "
                        "saves params-only on every improvement) - the "
                        "checkpoint fetch dominates epoch wall time on "
                        "tunneled devices")
    p.add_argument("--resume", type=str)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--hifigan_dir", type=str, default="vocoder_checkpoints/LJ_FT_T2_V3")
    p.add_argument("--text", type=str,
                   default="You are using the SPEV text-to-speech synthesis system.")
    p.add_argument("--output", type=str, default="output.wav")
    p.add_argument("--checkpoint", type=str, default="checkpoints/run_stable/best.spev")
    p.add_argument("--breathiness", type=float, default=0.1, help="Breathiness control 0-0.8")
    p.add_argument("--roughness", type=float, default=0.05, help="Roughness control 0-1.5")
    p.add_argument("--brightness", type=float, default=0.0, help="Brightness control -2.5 to 2.5")
    p.add_argument("--pitch_scale", type=float, default=1.0)
    p.add_argument("--duration_scale", type=float, default=1.0)
    p.add_argument("--energy_scale", type=float, default=1.0)
    return p


@cli_guard
def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.mode == "train":
        run_training(args)
    else:
        from spev_tpu.infer.synthesis import infer_tts

        print(f"Generating speech for: '{args.text}'")
        wav, mel = infer_tts(
            args.checkpoint,
            args.text,
            breathiness=args.breathiness,
            roughness=args.roughness,
            brightness=args.brightness,
            pitch_scale=args.pitch_scale,
            duration_scale=args.duration_scale,
            energy_scale=args.energy_scale,
            hifigan_dir=args.hifigan_dir,
        )
        write_outputs(wav, mel, args.output)


if __name__ == "__main__":
    main()
