"""Reference-compatible entry point: ``python spev_temporal_policy.py
--emotion relief ...`` — the temporal-curve embodied agent (reference
``spev_temporal_policy.py:254-269``)."""

from spev_tpu.cli.embodied import temporal_main as main

if __name__ == "__main__":
    main()
