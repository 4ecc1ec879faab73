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

import numpy as np

from spev_tpu.cli.common import cli_guard, run_training, write_outputs


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="spev-advanced")
    p.add_argument("--mode", type=str, default="infer", choices=["train", "infer"])
    # training
    p.add_argument("--data_dir", type=str, default="data/training_data")
    p.add_argument("--textgrid_dir", type=str, default="data/textgrid_data")
    p.add_argument("--name", type=str, default="spev_advanced")
    p.add_argument("--resume", type=str)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
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
    rules + word emphasis + mel-domain voice-quality DSP."""
    import jax
    import jax.numpy as jnp

    from spev_tpu.agents.prosody import vad_to_knobs
    from spev_tpu.infer.synthesis import Synthesizer
    from spev_tpu.models.advanced import age_pitch_scale, lung_capacity_effect
    from spev_tpu.ops.mel_dsp import apply_voice_quality
    from spev_tpu.text.emphasis import parse_emphasis, word_emphasis_to_phonemes

    synth = Synthesizer(args.checkpoint, hifigan_dir=args.hifigan_dir)
    knobs = vad_to_knobs(args.valence, args.arousal, args.dominance)
    lung = lung_capacity_effect(args.lung_capacity)

    pitch_scale = age_pitch_scale(args.age, args.pitch_scale * knobs["pitch_scale"])
    duration_scale = args.duration_scale * knobs["duration_scale"] * lung.duration_scale
    energy_scale = args.energy_scale * knobs.get("energy_scale", 1.0)

    phones = synth.g2p.phonemes(args.text)
    n = len(phones)
    breath = np.clip(
        np.full((n,), knobs["breathiness"] + 0.5 * args.breathiness + lung.breath_boost),
        0.0, 0.8,
    ).astype(np.float32)
    rough = np.clip(
        np.full((n,), knobs["roughness"] + 0.5 * args.roughness), 0.0, 1.5
    ).astype(np.float32)
    bright = np.clip(
        np.full((n,), knobs["brightness"] - 0.8 * args.nasality), -2.5, 2.5
    ).astype(np.float32)

    # word emphasis scales duration/pitch/energy per phoneme (documented
    # spev_advanced semantics, PRODUCTION_SYSTEM_SUMMARY.md:95-99)
    emphasis_vec = None
    if args.word_emphasis.strip():
        scales = parse_emphasis(args.word_emphasis)
        per_word = synth.g2p.phonemes_per_word(args.text)
        emphasis = word_emphasis_to_phonemes(scales, per_word)
        emphasis_vec = np.ones((n,), np.float32)
        m = min(len(emphasis), n)
        emphasis_vec[:m] = emphasis[:m]

    ids = synth.phonemes_to_ids(phones)
    has_advanced = isinstance(synth.params, dict) and "advanced" in synth.params
    # learned nasality channel: checkpoints trained with use_nasality carry a
    # nasal head; --nasality then drives learned weights, with the documented
    # mel-DSP composing on top below
    nasal_vec = (
        np.full((n,), np.clip(args.nasality, 0.0, 1.0), np.float32)
        if synth.model_cfg.use_nasality else None
    )
    wav, mel = synth.synthesize_ids(
        ids,
        breath=breath,
        rough=rough,
        bright=bright,
        nasal=nasal_vec,
        duration_scale=duration_scale if emphasis_vec is None else duration_scale * emphasis_vec,
        pitch_scale=pitch_scale if emphasis_vec is None else pitch_scale * emphasis_vec,
        energy_scale=energy_scale if emphasis_vec is None else energy_scale * emphasis_vec,
        speaker_id=args.speaker if has_advanced else None,
        vad=(args.valence, args.arousal, args.dominance) if has_advanced else None,
    )

    # documented mel-domain DSP effects, then re-vocode if any are active
    if args.breathiness or args.roughness or args.nasality:
        mel_j = apply_voice_quality(
            jnp.asarray(mel)[None],
            jax.random.PRNGKey(0),
            breathiness=args.breathiness,
            roughness=args.roughness,
            nasality=args.nasality,
        )[0]
        mel = np.asarray(mel_j)
        wav = np.asarray(synth.vocoder.infer(mel_j))
    return wav, mel


@cli_guard
def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.mode == "train":
        # the documented advanced training surface: VAD conditioning + the
        # learned nasality channel (+0.1·L_nasal,
        # PRODUCTION_SYSTEM_SUMMARY.md:133)
        run_training(args, model_overrides={"use_vad": True, "use_nasality": True})
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
