"""Reference-compatible entry point: ``python spev_embodied_core.py --text
"... [sigh] ..." --emotion exhausted ...`` (reference
``spev_embodied_core.py:260-274``)."""

from spev_tpu.cli.embodied import main

if __name__ == "__main__":
    main()
