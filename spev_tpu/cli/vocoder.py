"""Vocoder (HiFi-GAN) training / fine-tuning CLI.

    python -m spev_tpu.cli.vocoder --data_dir wavs/ --name voc_run \
        [--finetune_from vocoder_checkpoints/LJ_FT_T2_V3] \
        [--config v1|v3] [--steps 10000] [--batch_size 8] [--segment_frames 32]

Trains on random fixed-length crops: (log-mel via the framework kernels,
waveform) pairs.  ``--finetune_from`` seeds the generator from an upstream
directory (config.json + g_*) — the LJ_FT workflow the reference could only
download the result of.
"""

from __future__ import annotations

import argparse

from spev_tpu.cli.common import cli_guard
from spev_tpu.errors import UserError
import glob
import os
import random

import numpy as np


def make_crop_batcher(wavs, audio, segment_frames: int, batch_size: int,
                      cache_files: int = 1000, gta_by_path=None,
                      data_dir: str = "", seed: int = 0):
    """Random fixed-length (mel, waveform) crop batches for GAN training.

    Returns a zero-arg callable yielding ``(mel (B,F,M), wav (B,F·hop))``
    numpy batches.  The full-utterance mel is computed ONCE per file
    (mel-only kernel — no pyin/RMS/centroid); batches then crop it
    host-side on hop boundaries.  A per-crop mel device call would cost
    one relay round trip per batch ITEM (16 × ~45 ms RTT per batch — 6×
    the whole GAN step at 'default' precision); cropping the full mel
    also gives edge frames their true sample context instead of the
    crop's zero padding.  Files too short for one crop skip extraction
    entirely (mel=None).  With ``gta_by_path`` ({wav path: (T, n_mels)}),
    crops condition on those teacher-forced mels instead of the ground
    truth (GTA fine-tuning) — frame-aligned with the waveform crop by the
    same hop arithmetic.
    """
    from spev_tpu.data.dataset import FeatureExtractor
    from spev_tpu.utils import native

    hop = audio.hop_length
    seg = segment_frames * hop
    fx = FeatureExtractor(audio)
    rng = random.Random(seed)
    audio_cache = {}
    too_short: set = set()

    def load(path):
        if path not in audio_cache:
            y, sr = native.read_wav(path)
            if sr != audio.sample_rate:
                from spev_tpu.utils.wavio import resample_linear

                y = resample_linear(y, sr, audio.sample_rate)
            mel = None
            if len(y) >= seg + hop:
                if gta_by_path is not None:
                    mel = gta_by_path[path]  # (T, n_mels), teacher-forced
                else:
                    mel = np.asarray(fx.mel(y), np.float32).T  # (T, n_mels)
            if len(audio_cache) >= cache_files:
                audio_cache.pop(next(iter(audio_cache)))  # FIFO eviction
            audio_cache[path] = (y, mel)
        return audio_cache[path]

    def batch():
        wav_crops, mel_crops = [], []
        while len(wav_crops) < batch_size:
            path = rng.choice(wavs)
            if path not in too_short:
                y, mel_full = load(path)
                if mel_full is not None:
                    start = rng.randrange(0, len(y) - seg) // hop * hop
                    mel = mel_full[start // hop :][:segment_frames]
                    if mel.shape[0] >= segment_frames:
                        wav_crops.append(y[start : start + seg])
                        mel_crops.append(mel)
                        continue
                too_short.add(path)
            if len(too_short) == len(wavs):
                raise UserError(
                    f"no wav under {data_dir} is long enough for one "
                    f"{seg + hop}-sample training segment; lower "
                    f"--segment_frames or provide longer audio"
                )
        return np.stack(mel_crops), np.stack(wav_crops)

    return batch


@cli_guard
def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="spev-vocoder-train")
    p.add_argument("--data_dir", required=True, help="directory of wav files")
    p.add_argument("--name", default="vocoder_run")
    p.add_argument("--config", default="v1", choices=["v1", "v3", "tiny"],
                   help="generator size (tiny = smoke-test scale)")
    p.add_argument("--finetune_from", default=None,
                   help="upstream HiFi-GAN dir (config.json + g_*) OR a "
                        "gen_*.spev saved by this trainer (generator-only "
                        "warm start; pair with the matching --config)")
    p.add_argument("--resume_state", default=None,
                   help="state_latest.spev from a previous run: restores "
                        "generator + discriminators + optimizer states + "
                        "step for exact resume (upstream's g_*+do_* "
                        "semantics; pair with the same --config/--periods/"
                        "--scales)")
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--segment_frames", type=int, default=32,
                   help="mel frames per training crop")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--disc_warmup", type=int, default=0,
                   help="train the discriminators ONLY (generator frozen) "
                        "for the first N steps — use when warm-starting "
                        "from a generator-only checkpoint (--finetune_from "
                        "gen_*.spev): fresh discriminators otherwise feed "
                        "the strong generator noise gradients (adversarial "
                        "+ feature-matching terms against random features), "
                        "which measurably regresses copy-synthesis MCD for "
                        "thousands of steps (docs/QUALITY.md GTA table)")
    p.add_argument("--periods", type=str, default="2,3,5,7,11",
                   help="MPD periods (fewer = faster compile/steps)")
    p.add_argument("--scales", type=int, default=3, help="MSD scales")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--precision", default="default", choices=["high", "default"],
                   help="matmul/conv precision for the GAN step: 'default' = "
                        "single-pass bf16 (the recommended mode — ~2.8x faster, "
                        "and upstream HiFi-GAN itself trains under fp16 AMP; "
                        "f32 params/optimizer are kept either way); 'high' = "
                        "bf16x3 parity-grade matmuls")
    p.add_argument("--mel_weight", type=float, default=45.0,
                   help="weight of the mel-L1 term in L_G (upstream 45); "
                        "raise for a final mel-fidelity polish phase at "
                        "some cost in adversarial texture")
    p.add_argument("--fm_weight", type=float, default=2.0,
                   help="weight of the feature-matching term in L_G "
                        "(upstream 2)")
    p.add_argument("--disc_dtype", default=None, choices=["bf16"],
                   help="run the discriminators with bf16 weights+activations "
                        "(f32 loss accumulation): halves D-side HBM traffic "
                        "(docs/BENCH.md roofline); master params stay f32")
    p.add_argument("--step_impl", default="fused_folded",
                   choices=["fused_folded", "split_unfolded"],
                   help="training-step implementation: 'fused_folded' (the "
                        "default) runs ONE jitted graph per step with the "
                        "generator forward computed once (jax.vjp) through "
                        "the polyphase-folded MXU-shaped graph — same "
                        "optimization to float tolerance, measured ~2x "
                        "steps/s (docs/BENCH.md); 'split_unfolded' keeps "
                        "the two-dispatch parity-grade graphs")
    p.add_argument("--mesh", type=int, default=1,
                   help="data-parallel devices: shard each crop batch over "
                        "an N-device 'data' mesh (GAN state replicated; "
                        "XLA emits the gradient all-reduce over ICI). "
                        "--batch_size must be divisible by N")
    p.add_argument("--cache_files", type=int, default=1000,
                   help="max files held in the in-RAM wav+mel cache "
                        "(FIFO eviction; ~1 MB per second of audio)")
    p.add_argument("--gta_checkpoint", default=None,
                   help="acoustic checkpoint (.spev/.pt): condition on its "
                        "teacher-forced (ground-truth-aligned) predicted "
                        "mels instead of gt mels — the upstream LJ_FT "
                        "fine-tuning workflow whose result the reference "
                        "downloads.  --data_dir must then be a training "
                        "corpus ({id}.wav + {id}.txt [+ TextGrids])")
    p.add_argument("--textgrid_dir", default=None,
                   help="MFA TextGrids for the GTA corpus (optional)")
    from spev_tpu.cli.common import add_cache_flags

    add_cache_flags(p)
    args = p.parse_args(argv)
    if args.disc_warmup >= args.steps:
        raise UserError(f"--disc_warmup {args.disc_warmup} must be < --steps "
                        f"{args.steps} (warmup steps never save a generator)")

    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from spev_tpu.config import AudioConfig
    from spev_tpu.diag.metrics import log_metrics
    from spev_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
    from spev_tpu.train.vocoder_trainer import (
        init_vocoder_train_state,
        make_vocoder_train_step,
        save_generator,
    )

    audio = AudioConfig()
    seg = args.segment_frames * audio.hop_length

    if args.config == "v1":
        cfg = HiFiGANConfig()
    elif args.config == "v3":
        cfg = HiFiGANConfig.v3()
    else:  # tiny smoke-test generator
        cfg = HiFiGANConfig(
            resblock="2", upsample_rates=(8, 8, 4), upsample_kernel_sizes=(16, 16, 8),
            upsample_initial_channel=16, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 2),),
        )
    gen_params = None
    if args.finetune_from:
        if args.finetune_from.endswith(".spev"):
            # resume from this trainer's OWN saved generator (gen_*.spev,
            # architecture given by --config) — found by use: only the
            # upstream dir form was accepted, so a stopped run could not
            # continue from its checkpoints
            from spev_tpu.train.checkpoint import load_params

            gen_params, _, _ = load_params(args.finetune_from)
        else:
            gen = HiFiGANGenerator.from_pretrained(args.finetune_from)
            cfg, gen_params = gen.cfg, gen.params
        print(f"fine-tuning from {args.finetune_from}")

    wavs = sorted(glob.glob(os.path.join(args.data_dir, "**", "*.wav"), recursive=True))
    if not wavs:
        raise FileNotFoundError(f"no wavs under {args.data_dir}")
    print(f"{len(wavs)} wavs; segment {seg} samples ({args.segment_frames} frames)")

    gta_by_path = None
    if args.gta_checkpoint:
        # GTA mode: build the training dataset, teacher-force the acoustic
        # model over it once, and condition every crop on the PREDICTED mel
        # (frame-aligned with the gt waveform by construction)
        import re

        from spev_tpu.data.dataset import SpevDataset
        from spev_tpu.infer.gta import compute_gta_mels

        ds = SpevDataset(args.data_dir, textgrid_dir=args.textgrid_dir,
                         cache_dir=args.cache_dir,
                         force_rebuild=args.force_rebuild)
        gta = compute_gta_mels(args.gta_checkpoint, ds)
        gta_by_path = {}
        for i, m in gta.items():
            # ds.files[i] is 'u_{w:05d}.npz' where w indexes the dataset's
            # sorted recursive wav glob (same glob as `wavs` above)
            w = int(re.match(r"u_(\d+)\.npz$", ds.files[i]).group(1))
            gta_by_path[wavs[w]] = np.ascontiguousarray(m)
        wavs = [p for p in wavs if p in gta_by_path]
        if not wavs:
            raise UserError("GTA produced no usable utterances "
                            "(all exceed the frame buckets?)")
        print(f"GTA conditioning from {args.gta_checkpoint}: "
              f"{len(wavs)} utterances")

    make_batch = make_crop_batcher(
        wavs, audio, args.segment_frames, args.batch_size,
        cache_files=args.cache_files, gta_by_path=gta_by_path,
        data_dir=args.data_dir,
    )

    def batch():
        mel_crops, wav_crops = make_batch()
        return (
            jnp.asarray(mel_crops, jnp.float32),
            jnp.asarray(wav_crops, jnp.float32),
        )

    from spev_tpu.models import modules

    modules.set_matmul_precision(args.precision)
    periods = tuple(int(x) for x in args.periods.split(",") if x.strip())
    state = init_vocoder_train_state(jax.random.PRNGKey(0), cfg, gen_params=gen_params,
                                     periods=periods, n_scales=args.scales, lr=args.lr)
    if args.resume_state:
        from spev_tpu.train.vocoder_trainer import load_state

        state = load_state(args.resume_state, state)
        print(f"resumed full GAN state from {args.resume_state} "
              f"(step {int(state.step)})")
    mesh = None
    if args.mesh > 1:
        from spev_tpu.parallel.mesh import make_mesh

        if args.batch_size % args.mesh:
            raise UserError(f"--batch_size {args.batch_size} not divisible "
                            f"by --mesh {args.mesh}")
        mesh = make_mesh((args.mesh,), ("data",))
        print(f"data-parallel over {args.mesh} devices")
    fast = args.step_impl == "fused_folded"
    step = make_vocoder_train_step(cfg, audio, periods=periods, lr=args.lr,
                                   mesh=mesh, fm_weight=args.fm_weight,
                                   mel_weight=args.mel_weight,
                                   folded=fast, fused=fast,
                                   disc_dtype=args.disc_dtype)
    ckpt_dir = os.path.join("checkpoints", args.name)
    log_dir = os.path.join("logs", args.name)
    os.makedirs(ckpt_dir, exist_ok=True)

    # stage crops+mels ahead of the GAN step (wav decode / crop / mel
    # frontend overlap device training; see data/prefetch.py)
    from spev_tpu.data.prefetch import prefetch

    def batches():
        for _ in range(args.steps):
            yield batch()

    for i, (mel, wav) in enumerate(prefetch(batches(), depth=2)):
        if i < args.disc_warmup:
            state, d_loss, _ok = step.d_step(state, mel, wav)
            if (i + 1) % args.log_every == 0:
                print(f"step {i + 1} [disc warmup]: d={float(d_loss):.3f}")
            continue
        state, m = step(state, mel, wav)
        if (i + 1) % args.log_every == 0:
            print(
                f"step {i + 1}: d={float(m['d_loss']):.3f} g={float(m['g_loss']):.3f} "
                f"mel={float(m['g_mel']):.3f} skipped={int(float(m['skipped']))}"
            )
            log_metrics(log_dir, i + 1, {k: float(v) for k, v in m.items()})
        if (i + 1) % args.save_every == 0 or i + 1 == args.steps:
            path = os.path.join(ckpt_dir, f"gen_{i + 1:08d}.spev")
            save_generator(path, state, cfg)
            # full GAN state (gen+disc+opts+step) for exact resume — one
            # rolling file: it is ~4x the generator, so keep only latest
            from spev_tpu.train.vocoder_trainer import save_state

            save_state(os.path.join(ckpt_dir, "state_latest.spev"), state)
            print(f"saved {path} (+ state_latest.spev)")


if __name__ == "__main__":
    main()
