"""Mesh-native trainer: one jitted update step, NaN-skip policy, warmup.

Rebuilds the reference Trainer (``spev_real_metrics.py:474-707``) as a pjit
program:

- AdamW(lr, betas=(0.9, 0.98), eps=1e-9, wd=0.01) with the reference's
  linear warmup ``lr·min(step/4000, 1)`` (``:493-514``) and global-norm clip
  1.0 (``:578``).
- The reference's NaN economics — skip a batch on non-finite loss, skip the
  optimizer step on non-finite grad norm, abort after >10 NaN batches
  (``:527-528,565-589``) — cannot branch inside a jitted step, so the step
  computes everything unconditionally and applies a **masked update**:
  ``params = where(finite, new, old)`` (SURVEY.md §7 hard part #6).  The
  host reads the returned ``skipped`` flag to keep the abort budget.
- Data parallelism: batch sharded on the mesh 'data' axis; the gradient
  all-reduce over ICI is emitted by XLA from the shardings.  Tensor
  parallelism engages automatically when the mesh has a 'model' axis
  (see `spev_tpu.parallel.mesh`).
- Two-phase schedule (documented spev_tts: duration-only warmup epochs →
  full, ``README.md:154-156``): the phase enters the step as a static
  ``variance_weight`` (two compiled graphs).
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Iterable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from spev_tpu.config import SpevConfig
from spev_tpu.data.prefetch import prefetch
from spev_tpu.models.fastspeech2 import apply_fastspeech2, init_fastspeech2
from spev_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
from spev_tpu.train.loss import compute_losses


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32, counts *applied* updates (reference step_num)


def make_optimizer(cfg: SpevConfig) -> optax.GradientTransformation:
    tcfg = cfg.train

    def schedule(count):
        # reference: step_num is incremented before the update, so the n-th
        # applied update (count = n-1) uses lr·min(n/warmup, 1)  (``:509-514``)
        step = jnp.maximum(count + 1, 1).astype(jnp.float32)
        return tcfg.learning_rate * jnp.minimum(step / tcfg.warmup_steps, 1.0)

    return optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=tcfg.betas[0],
            b2=tcfg.betas[1],
            eps=tcfg.eps,
            weight_decay=tcfg.weight_decay,
        ),
    )


def init_train_state(key, cfg: SpevConfig) -> TrainState:
    if cfg.model.n_speakers > 1 or cfg.model.use_vad:
        from spev_tpu.models.advanced import init_advanced

        params = init_advanced(key, cfg.model)
    else:
        params = init_fastspeech2(key, cfg.model)
    opt = make_optimizer(cfg)
    return TrainState(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))


def _loss_fn(params, cfg: SpevConfig, batch, rng, variance_weight: float):
    kw = dict(
        target_durations=batch["durs"],
        target_pitch=batch["pitch"],
        target_energy=batch["energy"],
        target_breath=batch["breath"],
        target_rough=batch["rough"],
        target_bright=batch["bright"],
        dropout_rng=rng,
        deterministic=rng is None,
    )
    if cfg.model.use_nasality and "nasal" in batch:
        kw["target_nasal"] = batch["nasal"]
    adv_kw = _advanced_batch_kw(params, batch)
    if adv_kw:
        from spev_tpu.models.advanced import apply_advanced

        outputs = apply_advanced(
            params, cfg.model, batch["ids"], batch["lens"], **adv_kw, **kw,
        )
    else:
        outputs = apply_fastspeech2(params, cfg.model, batch["ids"], batch["lens"], **kw)
    return compute_losses(outputs, batch, cfg.train, variance_weight)


def _advanced_batch_kw(params, batch) -> dict:
    """Conditioning inputs that route a train/eval batch through the
    advanced wrapper: speaker ids (multi-speaker) and the per-utterance
    emotion-VAD target (the trainable VAD pathway — the batch's ``vad``
    feeds ``vad_proj`` so the emotion embedding receives gradient,
    reference ``PRODUCTION_SYSTEM_SUMMARY.md:71-82,124-133``)."""
    if "advanced" not in params:
        return {}
    kw = {}
    if "speaker_ids" in batch:
        kw["speaker_ids"] = batch["speaker_ids"]
    if "vad" in batch and "vad_proj" in params["advanced"]:
        kw["vad"] = batch["vad"]
    return kw


def _resolve_dropout_impl(cfg: SpevConfig) -> str:
    impl = getattr(cfg.train, "dropout_rng_impl", "auto")
    if impl == "auto":
        from spev_tpu.utils.platform import on_tpu

        return "rbg" if on_tpu() else "threefry"
    return impl


def _dropout_key(raw, impl: str):
    """Convert a raw (2,) uint32 threefry key row into the configured PRNG.

    'rbg' switches mask *bit generation* to the TPU's hardware
    RngBitGenerator (measured 2.1x cheaper than threefry across the step's
    18 dropout sites); key splitting stays threefry-based inside jax, so
    stream safety is unchanged.  Host-side key plumbing (trainer loop,
    checkpoints) always carries raw threefry rows."""
    if raw is None or impl == "threefry":
        return raw
    data = jnp.tile(jnp.asarray(raw, jnp.uint32).reshape(-1)[:2], 2)
    return jax.random.wrap_key_data(data, impl=impl)


def make_train_step(
    cfg: SpevConfig,
    mesh,
    params_example,
    variance_weight: float = 1.0,
    use_dropout: bool = True,
    batch_keys=None,
) -> Callable:
    """Build the jitted, sharded train step.

    Returns step(state, batch, rng) -> (state, metrics).  batch arrays are
    sharded on 'data'; params/opt_state follow `param_shardings`.
    """
    from spev_tpu.models import modules as nn_mod

    nn_mod.set_matmul_precision(cfg.train.matmul_precision)
    rng_impl = _resolve_dropout_impl(cfg)
    opt = make_optimizer(cfg)
    p_sh = param_shardings(mesh, params_example)
    rep = replicated(mesh)
    b_sh = batch_sharding(mesh)

    accum = max(1, int(cfg.train.grad_accum))

    def step_fn(state: TrainState, batch: dict, rng) -> tuple[TrainState, dict]:
        drop_rng = rng if use_dropout else None
        if accum == 1:
            (loss, metrics), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
                state.params, cfg, batch, _dropout_key(drop_rng, rng_impl),
                variance_weight,
            )
        else:
            # gradient accumulation: split the batch into `accum` micro
            # batches and average grads over the finite ones via lax.scan
            # (reference semantics: loss/accum per micro-batch, one
            # optimizer step per window; non-finite micro-batches are
            # excluded rather than poisoning the window — docs/PARITY.md #5)
            def micro(b, i):
                return jax.tree.map(lambda x: x[i] if x.ndim >= 1 else x, b)

            B = batch["ids"].shape[0]
            mb = B // accum
            stacked = jax.tree.map(
                lambda x: x[: mb * accum].reshape((accum, mb) + x.shape[1:]), batch
            )
            rngs = (
                jax.random.split(drop_rng, accum) if drop_rng is not None else [None] * accum
            )

            have_rng = use_dropout and drop_rng is not None

            def body(carry, xs):
                gsum, lsum, msum, nok = carry
                mb_batch, r = xs
                (l, m), g = jax.value_and_grad(_loss_fn, has_aux=True)(
                    state.params, cfg, mb_batch,
                    _dropout_key(r, rng_impl) if have_rng else None,
                    variance_weight,
                )
                finite = jnp.isfinite(l)
                ff = finite.astype(jnp.float32)
                gsum = jax.tree.map(lambda a, b: a + jnp.where(finite, b, 0.0), gsum, g)
                lsum = lsum + jnp.where(finite, l, 0.0)
                msum = jax.tree.map(lambda a, b: a + jnp.where(finite, b, 0.0), msum, m)
                return (gsum, lsum, msum, nok + ff), None

            zero_g = jax.tree.map(jnp.zeros_like, state.params)
            # metric accumulator structure from an abstract evaluation
            _, m_template = jax.eval_shape(
                lambda p: _loss_fn(p, cfg, micro(stacked, 0), None, variance_weight),
                state.params,
            )
            zero_m = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), m_template)
            (gsum, lsum, msum, nok), _ = jax.lax.scan(
                body,
                (zero_g, jnp.zeros(()), zero_m, jnp.zeros(())),
                (stacked, jnp.stack(rngs) if drop_rng is not None else jnp.zeros((accum,))),
            )
            denom = jnp.maximum(nok, 1.0)
            grads = jax.tree.map(lambda g: g / denom, gsum)
            loss = lsum / denom
            metrics = jax.tree.map(lambda m: m / denom, msum)
            # window with zero finite micro-batches must be skipped
            loss = jnp.where(nok > 0, loss, jnp.nan)
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        okf = ok.astype(jnp.float32)
        grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        params = jax.tree.map(lambda old, new: jnp.where(ok, new, old), state.params, new_params)
        opt_state = jax.tree.map(
            lambda old, new: jnp.where(ok, new, old), state.opt_state, new_opt_state
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = gnorm
        metrics["skipped"] = 1.0 - okf
        metrics["lr"] = cfg.train.learning_rate * jnp.minimum(
            jnp.maximum(state.step + 1, 1).astype(jnp.float32) / cfg.train.warmup_steps, 1.0
        )
        return TrainState(params, opt_state, state.step + ok.astype(jnp.int32)), metrics

    state_sh = TrainState(
        params=p_sh,
        opt_state=jax.tree.map(lambda _: rep, opt.init(params_example)),
        step=rep,
    )
    if batch_keys is None:
        batch_keys = ("ids", "lens", "durs", "mel", "mel_lens", "log_durs",
                      "pitch", "energy", "breath", "rough", "bright")
        if cfg.model.use_nasality:
            batch_keys = batch_keys + ("nasal",)
    batch_sh = {k: b_sh for k in batch_keys}
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh, rep),
        out_shardings=(state_sh, None),
        donate_argnums=(0,),
    )


def make_eval_step(cfg: SpevConfig, mesh, params_example, batch_keys=None) -> Callable:
    """Jitted validation step: reference validate() computes the plain mel L1
    plus pitch+energy aux MSE (``spev_real_metrics.py:619-654``)."""
    from spev_tpu.models import modules as nn_mod

    nn_mod.set_matmul_precision(cfg.train.matmul_precision)
    p_sh = param_shardings(mesh, params_example)
    b_sh = batch_sharding(mesh)

    def eval_fn(params, batch):
        kw = dict(
            target_durations=batch["durs"],
            target_pitch=batch["pitch"],
            target_energy=batch["energy"],
            target_breath=batch["breath"],
            target_rough=batch["rough"],
            target_bright=batch["bright"],
        )
        if cfg.model.use_nasality and "nasal" in batch:
            kw["target_nasal"] = batch["nasal"]
        adv_kw = _advanced_batch_kw(params, batch)
        if adv_kw:
            from spev_tpu.models.advanced import apply_advanced

            outputs = apply_advanced(
                params, cfg.model, batch["ids"], batch["lens"], **adv_kw, **kw,
            )
        else:
            outputs = apply_fastspeech2(params, cfg.model, batch["ids"], batch["lens"], **kw)
        _, metrics = compute_losses(outputs, batch, cfg.train, 1.0)
        return {
            "val_mel": metrics["l_mel"],
            "val_aux": metrics["l_pitch"] + metrics["l_energy"],
            # first sample's mel pair for the per-epoch comparison plot
            # (reference ``spev_real_metrics.py:646-649``)
            "mel_pred_0": outputs["mel_pred"][0],
            "mel_target_0": batch["mel"][0],
            "mel_len_0": batch["mel_lens"][0],
            # full-batch duration predictions for the quality dashboard
            "log_dur_pred": outputs["log_duration_pred"],
        }

    if batch_keys is None:
        batch_keys = ("ids", "lens", "durs", "mel", "mel_lens", "log_durs",
                      "pitch", "energy", "breath", "rough", "bright")
        if cfg.model.use_nasality:
            batch_keys = batch_keys + ("nasal",)
    return jax.jit(eval_fn, in_shardings=(p_sh, {k: b_sh for k in batch_keys}),
                   out_shardings=None)


class Trainer:
    """Host-side training loop (epochs, NaN budget, validation, checkpoints).

    Mirrors the reference Trainer's observable behavior: per-epoch train/val
    summaries, ``last``/``best`` checkpoints carrying vocab+stats+step, NaN
    abort after >max_nan_batches, test-inference mel-statistics probes every
    10 epochs (SURVEY.md §5).
    """

    def __init__(
        self,
        cfg: SpevConfig,
        vocab,
        stats: dict,
        ckpt_dir: str = "checkpoints/run",
        log_dir: str = "logs/run",
        mesh=None,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.vocab = vocab
        self.stats = stats
        self.ckpt_dir = ckpt_dir
        self.log_dir = log_dir
        os.makedirs(ckpt_dir, exist_ok=True)
        os.makedirs(log_dir, exist_ok=True)
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.train.mesh_shape, cfg.train.mesh_axes
        )
        self.rng = jax.random.PRNGKey(seed)
        self.rng, init_key = jax.random.split(self.rng)
        self.state = init_train_state(init_key, cfg)
        self._steps = {}
        self._eval_step = None
        self.nan_count = 0
        self.best_val = math.inf
        self.epoch = 0

    def _get_step(self, variance_weight: float, batch: dict):
        """One compiled step per (phase, phoneme-bucket, frame-bucket)."""
        import dataclasses

        P = int(batch["ids"].shape[1])
        M = int(batch["mel"].shape[1])
        key = (float(variance_weight), P, M)
        if key not in self._steps:
            cfg = dataclasses.replace(
                self.cfg,
                model=dataclasses.replace(self.cfg.model, max_phonemes=P, max_frames=M),
            )
            self._steps[key] = make_train_step(
                cfg, self.mesh, self.state.params,
                variance_weight=float(variance_weight),
                batch_keys=tuple(sorted(batch)),
            )
        return self._steps[key]

    def train_epoch(self, batches: Iterable[dict]) -> dict:
        """Run one epoch over an iterable of numpy batch dicts.  Returns
        aggregate metrics.  Raises RuntimeError when the NaN budget is
        exhausted (reference ``:569-571``)."""
        vw = 0.0 if self.epoch < self.cfg.train.warmup_epochs else 1.0
        total, n = 0.0, 0
        last_metrics = {}
        # stage batches ahead of the device: npz loads + collate AND the
        # host→device transfer overlap compute (device_put inside the
        # prefetch thread starts the copy early, and the jitted step then
        # sees already-placed committed arrays — no per-argument transfer at
        # dispatch time).  TrainConfig.prefetch_batches=0 disables staging.
        sh = batch_sharding(self.mesh)

        def _placed(bs):
            for b in bs:
                yield jax.tree.map(lambda x: jax.device_put(x, sh), b)

        batches = prefetch(_placed(batches), depth=self.cfg.train.prefetch_batches)

        def consume(metrics):
            # `metrics` is already on host (fetched by flush()).
            nonlocal total, n, last_metrics
            if float(metrics["skipped"]) > 0.5:
                self.nan_count += 1
                if self.nan_count > self.cfg.train.max_nan_batches:
                    raise RuntimeError(
                        f"Too many NaN batches ({self.nan_count}). Stopping training."
                    )
                return
            total += float(metrics["loss"])
            n += 1
            last_metrics = metrics

        # Per-step metric fetches serialize the host on the device's
        # round-trip latency (~30 ms on a tunneled chip — more than a bf16
        # step).  The loop instead keeps a WINDOW of per-step device metric
        # dicts and host-fetches the whole window with one coalesced
        # device_get; the NaN budget trips at window granularity
        # (TrainConfig.metrics_window, default 8).
        window = max(1, int(getattr(self.cfg.train, "metrics_window", 8)))
        pending: list = []

        def flush():
            nonlocal pending
            if not pending:
                return
            fetched = jax.device_get(pending)  # one coalesced transfer
            pending = []
            for m in fetched:
                consume(m)

        # dropout keys pre-split in chunks: ONE device dispatch + ONE host
        # fetch per 64 steps instead of a jax.random.split round trip per
        # step; keys feed the jitted step as host uint32 rows (replicated
        # placement is handled by the step's in_shardings)
        key_chunk: list = []

        def next_key():
            nonlocal key_chunk
            if not key_chunk:
                self.rng, sub = jax.random.split(self.rng)
                key_chunk = list(np.asarray(jax.random.split(sub, 64)))
            return key_chunk.pop()

        for batch in batches:
            step = self._get_step(vw, batch)
            self.state, metrics = step(self.state, batch, next_key())
            pending.append(metrics)
            if len(pending) >= window:
                flush()
        flush()
        self.epoch += 1
        out = {k: float(v) for k, v in last_metrics.items()}
        out["train_loss"] = total / max(n, 1)
        return out

    def _get_eval_step(self, batch: dict):
        import dataclasses

        P = int(batch["ids"].shape[1])
        M = int(batch["mel"].shape[1])
        if self._eval_step is None:
            self._eval_step = {}
        if (P, M) not in self._eval_step:
            cfg = dataclasses.replace(
                self.cfg,
                model=dataclasses.replace(self.cfg.model, max_phonemes=P, max_frames=M),
            )
            self._eval_step[(P, M)] = make_eval_step(
                cfg, self.mesh, self.state.params, batch_keys=tuple(sorted(batch))
            )
        return self._eval_step[(P, M)]

    def validate(self, batches: Iterable[dict], save_plot_epoch: Optional[int] = None) -> float:
        tot, aux, n = 0.0, 0.0, 0
        self.last_quality = {}
        for i, batch in enumerate(batches):
            m = self._get_eval_step(batch)(self.state.params, batch)
            # one coalesced fetch of the two scalars (each separate float()
            # costs a full host RTT on tunneled devices); the large mel
            # arrays transfer only for the first batch's plot/quality pass
            scal = jax.device_get({"val_mel": m["val_mel"], "val_aux": m["val_aux"]})
            v = float(scal["val_mel"])
            if math.isfinite(v):
                tot += v
                aux += float(scal["val_aux"])
                n += 1
            if i == 0:
                m = jax.device_get(m)  # one transfer for plot + quality arrays
                self.last_quality = self._first_batch_quality(m, batch)
                if save_plot_epoch is not None:
                    from spev_tpu.diag.plots import save_comparison_plot

                    L = int(m["mel_len_0"])
                    save_comparison_plot(
                        np.asarray(m["mel_target_0"])[:L].T,
                        np.asarray(m["mel_pred_0"])[:L].T,
                        os.path.join(self.log_dir, f"val_{save_plot_epoch}.png"),
                    )
        return tot / max(n, 1)

    def _first_batch_quality(self, m: dict, batch: dict) -> dict:
        """Objective quality on the first val batch, against the reference's
        documented targets (``PRODUCTION_SYSTEM_SUMMARY.md:227-231``: MCD
        < 6.0 dB, duration error < 10%) — targets the reference states but
        cannot measure."""
        from spev_tpu.diag.quality import duration_error_pct, mel_cepstral_distortion

        out = {}
        try:
            L = int(m["mel_len_0"])
            out["val_mcd_db"] = float(mel_cepstral_distortion(
                np.asarray(m["mel_pred_0"])[:L], np.asarray(m["mel_target_0"])[:L]))
            # teacher-forced duration decode vs target frames on valid phonemes
            ld = np.asarray(m["log_dur_pred"], np.float32)
            pred = np.round(np.clip(np.exp(ld) - 1.0, 0.0, 500.0))
            tgt = np.asarray(batch["durs"], np.float32)
            mask = tgt > 0
            if mask.any():
                out["val_dur_err_pct"] = float(duration_error_pct(pred[mask], tgt[mask]))
        except Exception:
            pass  # quality dashboard must never fail validation
        return out

    def save(self, name: str = "last", include_opt: bool = True) -> str:
        """``include_opt=False`` writes a params-only (inference) checkpoint
        — 1/3 the bytes of the resumable form.  The checkpoint fetch is the
        dominant per-epoch cost on a tunneled/remote device (a full-size
        state is ~500 MB; best-so-far improves almost every early epoch),
        so callers should keep frequent saves params-only and write the
        resumable ``last`` on a cadence."""
        from spev_tpu.train.checkpoint import model_config_dict, save_checkpoint

        path = os.path.join(self.ckpt_dir, f"{name}.spev")
        save_checkpoint(
            path,
            params=self.state.params,
            opt_state=self.state.opt_state if include_opt else None,
            step=int(self.state.step),
            epoch=self.epoch,
            vocab=list(self.vocab.symbols) if hasattr(self.vocab, "symbols") else list(self.vocab),
            stats=self.stats,
            model_config=model_config_dict(self.cfg.model),
        )
        return path

    def maybe_save_best(self, val_loss: float) -> bool:
        """Params-only on purpose: ``best`` is the inference artifact;
        exact resume goes through ``last`` (which keeps the optimizer)."""
        if math.isfinite(val_loss) and val_loss < self.best_val:
            self.best_val = val_loss
            self.save("best", include_opt=False)
            return True
        return False

    def restore(self, path: str) -> None:
        from spev_tpu.train.checkpoint import load_checkpoint, load_checkpoint_into

        if load_checkpoint(path).get("optimizer") is None:
            print(f"[trainer] WARNING: {path} has no optimizer state "
                  "(params-only checkpoint, e.g. best.spev) — optimizer "
                  "reinitialized, LR schedule restarts from the saved step; "
                  "resume from last.spev for exact continuation")
        state, epoch = load_checkpoint_into(path, self.state)
        self.state = state
        self.epoch = epoch
