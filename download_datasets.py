"""Reference-compatible entry point: ``python download_datasets.py
--dataset single-speaker|multi-speaker|both`` (reference
``download_datasets.py:112-128``)."""

import sys

from spev_tpu.cli.download import main as _main


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    _main(["download", *argv])


if __name__ == "__main__":
    main()
