"""Checkpoint quality evaluation CLI.

    python -m spev_tpu.cli.evaluate --checkpoint best.spev --data_dir corpus \
        [--textgrid_dir DIR] [--cache_dir cache_spev] [--split val|train|all] \
        [--val_frac 0.05] [--seed 0] [--batch_size 8] [--json out.json]

Measures the reference's documented-but-never-measured quality targets
(``PRODUCTION_SYSTEM_SUMMARY.md:227-231``: MCD < 6.0 dB, duration error
< 10%) for any checkpoint over a whole corpus or split.  ``--split val``
reproduces the trainer's 95/5 split (same seed semantics,
``spev_real_metrics.py:486-488``) so a model is scored on the utterances
its training never saw.
"""

from __future__ import annotations

import argparse
import json

from spev_tpu.cli.common import add_cache_flags, cli_guard
from spev_tpu.errors import UserError


@cli_guard
def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="spev-eval")
    p.add_argument("--checkpoint", required=True, help=".spev or torch .pt")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--textgrid_dir", default=None)
    p.add_argument("--split", default="val", choices=["val", "train", "all"])
    p.add_argument("--val_frac", type=float, default=0.05,
                   help="the trainer's split fraction (reference 95/5)")
    p.add_argument("--seed", type=int, default=0, help="split seed")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--g2p", default="auto")
    p.add_argument("--multi_speaker", action="store_true",
                   help="derive speaker labels from filename prefixes so a "
                        "multi-speaker checkpoint is evaluated WITH its "
                        "speaker conditioning (otherwise the speaker "
                        "embedding is bypassed)")
    p.add_argument("--vocoder", default=None,
                   help="also score the SERVING condition: vocode each "
                        "teacher-forced predicted mel and MCD the result "
                        "vs the ground-truth mel.  Accepts an upstream "
                        "HiFi-GAN dir (config.json + g_*) or a gen_*.spev "
                        "from spev-vocoder-train (pair with --gen_config)")
    p.add_argument("--gen_config", default="v3", choices=["v1", "v3"],
                   help="generator architecture for a gen_*.spev --vocoder")
    p.add_argument("--json", default=None, help="also write the full result here")
    add_cache_flags(p)
    args = p.parse_args(argv)

    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from spev_tpu.data.batching import train_val_split
    from spev_tpu.data.dataset import SpevDataset
    from spev_tpu.infer.evaluate import evaluate_checkpoint

    ds = SpevDataset(args.data_dir, textgrid_dir=args.textgrid_dir,
                     cache_dir=args.cache_dir, g2p_backend=args.g2p,
                     force_rebuild=args.force_rebuild,
                     multi_speaker=args.multi_speaker)
    if args.split == "all":
        indices = None
    else:
        tr, va = train_val_split(len(ds), args.val_frac, seed=args.seed)
        indices = va if args.split == "val" else tr
        if not indices:
            raise UserError(f"the {args.split} split is empty "
                            f"({len(ds)} utterances, val_frac {args.val_frac})")

    vocoder = None
    if args.vocoder:
        from spev_tpu.infer.vocoder import Vocoder

        if args.vocoder.endswith(".spev"):
            from spev_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
            from spev_tpu.train.checkpoint import load_params

            gparams, _, _ = load_params(args.vocoder)
            gcfg = (HiFiGANConfig() if args.gen_config == "v1"
                    else HiFiGANConfig.v3())
            vocoder = Vocoder(generator=HiFiGANGenerator(gcfg, gparams))
        else:
            vocoder = Vocoder(args.vocoder)

    res = evaluate_checkpoint(args.checkpoint, ds, indices=indices,
                              batch_size=args.batch_size, vocoder=vocoder)
    a = res["aggregate"]
    print(f"evaluated {a['n_utterances']} utterances "
          f"({args.split} split of {len(ds)}; {a['n_skipped']} over-bucket)")
    print(f"  MCD:            {a['mcd_db_mean']:.2f} dB mean / "
          f"{a['mcd_db_median']:.2f} dB median "
          f"[reference target < 6.0 dB: "
          f"{'PASS' if a['meets_mcd_target_6db'] else 'not met'}]")
    print(f"  duration error: {a['dur_err_pct_mean']:.2f}% mean / "
          f"{a['dur_err_pct_median']:.2f}% median "
          f"[reference target < 10%: "
          f"{'PASS' if a['meets_dur_err_target_10pct'] else 'not met'}]")
    if "f0_rmse_hz_mean" in a:
        print(f"  F0 RMSE:        {a['f0_rmse_hz_mean']:.2f} Hz mean / "
              f"{a['f0_rmse_hz_median']:.2f} Hz median "
              f"[reference target < 20 Hz: "
              f"{'PASS' if a['meets_f0_target_20hz'] else 'not met'}]")
    if "vocoded_mcd_db_mean" in a:
        print(f"  vocoded MCD:    {a['vocoded_mcd_db_mean']:.2f} dB mean / "
              f"{a['vocoded_mcd_db_median']:.2f} dB median "
              f"[serving condition; target < 6.0 dB: "
              f"{'PASS' if a['meets_vocoded_mcd_target_6db'] else 'not met'}]")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f, indent=1)
        print(f"full per-utterance result -> {args.json}")


if __name__ == "__main__":
    main()
