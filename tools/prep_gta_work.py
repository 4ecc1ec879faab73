"""Seed a tools/gta_demo.py work dir from an EXISTING trained acoustic
checkpoint + corpus (instead of gta_demo's own CPU-trained hidden-96 run).

Round-4 quality campaign: the acoustic model is the full-size (hidden 256)
`spev-tts`-trained checkpoint, so the GTA serving-condition score reflects
the strongest offline pipeline.  Reproduces exactly the layout
gta_demo.phase_train writes: acoustic.spev, corpus/ (full),
corpus_train/ (train split only — val stays held out from the fine-tune
arms), meta.json (va_idx under the CLI's split: val_fraction, seed).

Usage:
  python tools/prep_gta_work.py --work /root/gta_r4 \
      --acoustic checkpoints/q256/best.spev \
      --corpus .scratch/quality/corpus --cache .scratch/quality/cache \
      [--val_fraction 0.05] [--seed 0]
"""

import argparse
import glob
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", required=True)
    ap.add_argument("--acoustic", required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--cache", required=True)
    ap.add_argument("--val_fraction", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # metadata-only work

    from spev_tpu.data.batching import train_val_split
    from spev_tpu.data.dataset import SpevDataset

    os.makedirs(args.work, exist_ok=True)
    shutil.copy(args.acoustic, os.path.join(args.work, "acoustic.spev"))

    ds = SpevDataset(args.corpus,
                     textgrid_dir=os.path.join(args.corpus, "textgrids"),
                     cache_dir=args.cache, g2p_backend="rules")
    _tr, va_idx = train_val_split(len(ds), args.val_fraction, seed=args.seed)

    full = os.path.join(args.work, "corpus")
    if os.path.isdir(full):
        shutil.rmtree(full)
    shutil.copytree(args.corpus, full)

    va = set(int(re.match(r"u_(\d+)\.npz$", ds.files[i]).group(1))
             for i in va_idx)
    wavs = sorted(glob.glob(os.path.join(full, "**", "*.wav"), recursive=True))
    tr_dir = os.path.join(args.work, "corpus_train")
    tg_dir = os.path.join(tr_dir, "textgrids")
    if os.path.isdir(tr_dir):
        shutil.rmtree(tr_dir)
    os.makedirs(tg_dir, exist_ok=True)
    for w, path in enumerate(wavs):
        if w in va:
            continue
        base = os.path.splitext(os.path.basename(path))[0]
        shutil.copy(path, tr_dir)
        txt = os.path.join(full, base + ".txt")
        if os.path.exists(txt):
            shutil.copy(txt, tr_dir)
        tg = os.path.join(full, "textgrids", base + ".TextGrid")
        if os.path.exists(tg):
            shutil.copy(tg, tg_dir)

    meta = {
        "acoustic": os.path.abspath(args.acoustic),
        "va_idx": [int(i) for i in va_idx],
        "val_wavs": [os.path.basename(wavs[w]) for w in sorted(va)],
        "final_quality": {},
    }
    with open(os.path.join(args.work, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"seeded {args.work}: {len(wavs)} wavs, {len(va)} held out")


if __name__ == "__main__":
    main()
