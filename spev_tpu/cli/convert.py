"""Checkpoint conversion CLI: reference PyTorch ``.pt`` ↔ native ``.spev``.

Both directions preserve the full logical schema (model weights, vocab,
normalization stats, step/epoch); ``.pt`` → ``.spev`` needs no torch
installed (numpy-only zip reader), ``.spev`` → ``.pt`` requires torch on
the host.

    python -m spev_tpu.cli.convert to-spev best.pt  best.spev
    python -m spev_tpu.cli.convert to-pt   best.spev best.pt
    python -m spev_tpu.cli.convert info    best.pt
    python -m spev_tpu.cli.convert cache   cache_stable/ cache_spev/
    python -m spev_tpu.cli.convert cache   proper_cache_strict.pt cache_spev/

The ``cache`` command imports the reference's preprocessed training cache
(per-utterance ``u_*.pt`` + metadata.json, or a monolithic
``proper_cache_strict.pt``) so librosa/MFA preprocessing done with the
reference carries over without rerunning.
"""

from __future__ import annotations

import argparse

from spev_tpu.cli.common import cli_guard
import os


@cli_guard
def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="spev-convert")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("to-spev", "to-pt"):
        c = sub.add_parser(name)
        c.add_argument("src")
        c.add_argument("dst")
    i = sub.add_parser("info")
    i.add_argument("src")
    c = sub.add_parser("cache")
    c.add_argument("src", help="reference cache dir (u_*.pt + metadata.json) or monolithic .pt")
    c.add_argument("dst", help="output spev npz cache dir")
    args = p.parse_args(argv)

    if args.cmd == "cache":
        from spev_tpu.data.cache_import import (
            import_monolithic_cache,
            import_reference_cache,
        )

        if os.path.isdir(args.src):
            meta = import_reference_cache(args.src, args.dst)
        else:
            meta = import_monolithic_cache(args.src, args.dst)
        print(f"imported {len(meta['files'])} utterances, vocab {len(meta['vocab'])} "
              f"-> {args.dst}")
        return

    from spev_tpu.train.checkpoint import (
        export_reference_checkpoint,
        import_reference_checkpoint,
        load_checkpoint,
        load_params,
        save_checkpoint,
    )

    if args.cmd == "to-spev":
        params, vocab, stats, step, epoch = import_reference_checkpoint(args.src)
        save_checkpoint(args.dst, params, vocab=vocab, stats=stats, step=step, epoch=epoch)
        print(f"wrote {args.dst} (vocab {len(vocab)}, step {step}, epoch {epoch})")
    elif args.cmd == "to-pt":
        params, vocab, stats = load_params(args.src)
        meta = load_checkpoint(args.src)["meta"]
        export_reference_checkpoint(
            args.dst, params, vocab=vocab, stats=stats,
            step=meta["step_num"], epoch=meta["epoch"],
        )
        print(f"wrote {args.dst}")
    else:
        if args.src.endswith(".spev"):
            params, vocab, stats = load_params(args.src)
            meta = load_checkpoint(args.src)["meta"]
            step, epoch = meta["step_num"], meta["epoch"]
        else:
            params, vocab, stats, step, epoch = import_reference_checkpoint(args.src)
        import jax

        n_params = sum(int(x.size) for x in jax.tree.leaves(params))
        print(f"format: {'spev' if args.src.endswith('.spev') else 'torch .pt'}")
        print(f"parameters: {n_params:,}")
        print(f"vocab: {len(vocab)} symbols")
        print(f"stats: {stats}")
        print(f"step: {step}  epoch: {epoch}")


if __name__ == "__main__":
    main()
