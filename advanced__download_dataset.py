"""Reference-compatible entry point: ``python advanced__download_dataset.py
--dataset esd|jenny --in_dir ... --out_dir ...`` (reference
``advanced__download_dataset.py:128-140``)."""

import sys

from spev_tpu.cli.download import main as _main


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    _main(["prep", *argv])


if __name__ == "__main__":
    main()
