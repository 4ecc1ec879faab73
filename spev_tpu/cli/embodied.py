"""Embodied-agent CLIs (reference ``spev_embodied_core.py:260-274`` and
``spev_temporal_policy.py:254-269``)."""

from __future__ import annotations

import argparse

from spev_tpu.cli.common import cli_guard

from spev_tpu.utils.wavio import write_wav

STATIC_EMOTIONS = ["neutral", "exhausted", "excited", "secretive", "angry"]
TEMPORAL_EMOTIONS = ["neutral", "exhausted", "relief", "anxious", "angry"]


def _parser(temporal: bool) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="spev-temporal" if temporal else "spev-embodied")
    p.add_argument("--text", type=str, required=True,
                   help="Text with events, e.g. 'Hi [sigh] bye'")
    p.add_argument("--emotion", type=str, default="neutral",
                   choices=TEMPORAL_EMOTIONS if temporal else STATIC_EMOTIONS)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--hifigan_dir", type=str, default="./hifi-gan")
    p.add_argument("--output", type=str,
                   default="temporal_output.wav" if temporal else "embodied_output.wav")
    return p


def _run(temporal: bool, argv=None) -> None:
    from spev_tpu.agents.embodied import EmbodiedAgent
    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    args = _parser(temporal).parse_args(argv)
    agent = EmbodiedAgent(args.checkpoint, hifigan_dir=args.hifigan_dir, temporal=temporal)
    audio = agent.synthesize(args.text, args.emotion)
    write_wav(args.output, audio, 22050)
    print(f"Output saved to {args.output}")


@cli_guard
def main(argv=None) -> None:
    _run(temporal=False, argv=argv)


@cli_guard
def temporal_main(argv=None) -> None:
    _run(temporal=True, argv=argv)


if __name__ == "__main__":
    main()
