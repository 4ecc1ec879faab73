"""Reconstructed advanced CLI (the documented ``spev_advanced.py``,
SURVEY.md §2.9): voice-quality controls + VAD emotion + physiological
constraints + word emphasis.  Console scripts: ``spev-advanced-train`` /
``spev-advanced-infer`` (``--mode`` selects within one parser).

Flag surface per ``README.md:144-202``: ``--breathiness --roughness
--nasality --valence --arousal --dominance --age --lung_capacity
--word_emphasis "1.0,1.5,..." --output`` (train default 150 epochs).
"""

from __future__ import annotations

import argparse

from spev_tpu.cli.common import add_cache_flags, cli_guard, run_training, write_outputs


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="spev-advanced")
    p.add_argument("--mode", type=str, default="infer", choices=["train", "infer"])
    # training
    p.add_argument("--data_dir", type=str, default="data/training_data")
    p.add_argument("--textgrid_dir", type=str, default="data/textgrid_data")
    p.add_argument("--name", type=str, default="spev_advanced")
    add_cache_flags(p)
    p.add_argument("--save_every", type=int, default=10,
                   help="epochs between resumable `last` checkpoints and "
                        "val plots (the final epoch always saves; `best` "
                        "saves params-only on every improvement) - the "
                        "checkpoint fetch dominates epoch wall time on "
                        "tunneled devices")
    p.add_argument("--resume", type=str)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--multi_speaker", action="store_true",
                   help="derive speaker labels from filename prefixes "
                        "({speaker}_*.wav) and train a speaker embedding; "
                        "synthesize with --speaker")
    p.add_argument("--emotion_labels", action="store_true",
                   help="derive emotion labels from filename suffixes "
                        "(*_{emotion}.wav, the ESD prepper convention) and "
                        "train the VAD emotion embedding on the fixed "
                        "emotion->VAD table; sweep at inference with "
                        "--valence/--arousal/--dominance")
    p.add_argument("--reference_predictors", action="store_true",
                   help="keep the reference's LayerNorm(1) constant-output "
                        "variance predictors (checkpoint-parity mode); by "
                        "default this CLI trains functional per-phoneme "
                        "predictors (vp_output_norm=False) — required for "
                        "VAD/emphasis conditioning to steer prosody")
    # inference
    p.add_argument("--checkpoint", type=str, default="checkpoints/spev_advanced/best.spev")
    p.add_argument("--hifigan_dir", type=str, default="hifi-gan")
    p.add_argument("--text", type=str, default="Hello from advanced SPEV.")
    p.add_argument("--output", type=str, default="advanced_output.wav")
    # voice quality
    p.add_argument("--breathiness", type=float, default=0.0, help="0-1 aspiration noise")
    p.add_argument("--roughness", type=float, default=0.0, help="0-1 vocal fry")
    p.add_argument("--nasality", type=float, default=0.0, help="0-1 nasal resonance")
    # VAD emotion
    p.add_argument("--valence", type=float, default=0.0, help="-1..1")
    p.add_argument("--arousal", type=float, default=0.0, help="-1..1")
    p.add_argument("--dominance", type=float, default=0.0, help="-1..1")
    # physiology
    p.add_argument("--speaker", type=int, default=None,
                   help="speaker id (multi-speaker checkpoints)")
    p.add_argument("--age", type=float, default=25.0)
    p.add_argument("--lung_capacity", type=float, default=1.0, help="0-1")
    # expression
    p.add_argument("--word_emphasis", type=str, default="",
                   help="comma-separated per-word scales, e.g. '1.0,1.5,1.0'")
    p.add_argument("--pitch_scale", type=float, default=1.0)
    p.add_argument("--duration_scale", type=float, default=1.0)
    p.add_argument("--energy_scale", type=float, default=1.0)
    return p


def synthesize_advanced(args):
    """Advanced inference: learned controls + VAD knobs + physiological
    rules + word emphasis + mel-domain voice-quality DSP (shared engine:
    `spev_tpu.infer.advanced_api.synthesize_advanced_controls`)."""
    from spev_tpu.infer.advanced_api import synthesize_advanced_controls
    from spev_tpu.infer.synthesis import Synthesizer

    synth = Synthesizer(args.checkpoint, hifigan_dir=args.hifigan_dir)
    return synthesize_advanced_controls(
        synth,
        args.text,
        breathiness=args.breathiness,
        roughness=args.roughness,
        nasality=args.nasality,
        valence=args.valence,
        arousal=args.arousal,
        dominance=args.dominance,
        age=args.age,
        lung_capacity=args.lung_capacity,
        word_emphasis=args.word_emphasis,
        speaker=args.speaker,
        pitch_scale=args.pitch_scale,
        duration_scale=args.duration_scale,
        energy_scale=args.energy_scale,
    )


@cli_guard
def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.mode == "train":
        # the documented advanced training surface: VAD conditioning + the
        # learned nasality channel (+0.1·L_nasal,
        # PRODUCTION_SYSTEM_SUMMARY.md:133).  Functional variance
        # predictors by default (the LayerNorm(1) parity quirk outputs a
        # constant, which would sever VAD/emphasis from prosody).
        overrides = {"use_vad": True, "use_nasality": True}
        if not args.reference_predictors:
            overrides["vp_output_norm"] = False
        run_training(args, model_overrides=overrides)
    else:
        wav, mel = synthesize_advanced(args)
        write_outputs(wav, mel, args.output)


@cli_guard
def train_main(argv=None) -> None:
    main(["--mode", "train"] + (argv or []))


@cli_guard
def infer_main(argv=None) -> None:
    main(["--mode", "infer"] + (argv or []))


if __name__ == "__main__":
    main()
