"""Reference-compatible entry point for the documented ``spev_tts`` module
(two-phase warmup training + core inference; SURVEY.md §2.9).

Exports ``main`` (train) and ``inference_mode`` with the documented
console-script names (reference ``setup.py:86-94``)."""

from spev_tpu.cli.spev_tts import inference_mode, main

if __name__ == "__main__":
    main()
