"""Dataset acquisition CLI (reference ``download_datasets.py:112-128`` and
``advanced__download_dataset.py:128-140``)."""

from __future__ import annotations

import argparse

from spev_tpu.cli.common import cli_guard
import os


@cli_guard
def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="spev-download")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("download", help="download + process public datasets")
    d.add_argument("--dataset", choices=["single-speaker", "multi-speaker", "both"],
                   default="single-speaker")
    d.add_argument("--out_dir", default="data/training_data")
    d.add_argument("--work_dir", default="data/raw")
    d.add_argument("--limit", type=int, default=None)

    e = sub.add_parser("prep", help="convert a local dataset to wav/txt pairs")
    e.add_argument("--dataset", choices=["esd", "jenny"], required=True)
    e.add_argument("--in_dir", required=True)
    e.add_argument("--out_dir", required=True)
    e.add_argument("--limit", type=int, default=None)

    args = p.parse_args(argv)
    from spev_tpu.data import downloaders as dl

    if args.cmd == "prep":
        fn = dl.prep_esd if args.dataset == "esd" else dl.prep_jenny
        n = fn(args.in_dir, args.out_dir, limit=args.limit)
        print(f"prepared {n} utterances into {args.out_dir}")
        return

    if args.dataset in ("single-speaker", "both"):
        root = os.path.join(args.work_dir, "LJSpeech-1.1")
        if not os.path.exists(root):
            dl.download_and_extract(dl.LJSPEECH_URL, args.work_dir)
        n = dl.process_single_speaker(root, args.out_dir, limit=args.limit)
        print(f"LJSpeech: {n} utterances")
    if args.dataset in ("multi-speaker", "both"):
        root = os.path.join(args.work_dir, "LibriTTS_R")
        if not os.path.exists(root):
            dl.download_and_extract(dl.LIBRITTS_R_URL, args.work_dir)
        n = dl.process_multi_speaker(root, args.out_dir, limit=args.limit)
        print(f"LibriTTS-R: {n} utterances")


if __name__ == "__main__":
    main()
