"""Reference-compatible entry point for the documented ``spev_advanced``
module (VAD / age / lung capacity / word emphasis / nasality; SURVEY.md §2.9)."""

from spev_tpu.cli.spev_advanced import infer_main, main, train_main

if __name__ == "__main__":
    main()
