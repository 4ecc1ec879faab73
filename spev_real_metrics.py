"""Reference-compatible entry point: ``python spev_real_metrics.py --mode train|infer ...``.

Thin shim over ``spev_tpu.cli.real_metrics`` (the TPU-native engine with
the reference's flag surface — ``/root/reference/spev_real_metrics.py:789-840``)
so reference users' invocations keep working verbatim.
"""

from spev_tpu.cli.real_metrics import main

if __name__ == "__main__":
    main()
