"""End-to-end synthesis: text → phoneme IDs → jitted FastSpeech2 → jitted
HiFi-GAN/Griffin-Lim → waveform.

Serving design (vs the reference ``infer_tts``, ``spev_real_metrics.py:
738-787``):

- `Synthesizer` loads the checkpoint once and caches one compiled graph per
  (phoneme-bucket, frame-bucket) pair; per request the only host↔device
  traffic is the input IDs going down and (mel_len, waveform) coming back.
- The acoustic model and vocoder are fused in a single jit, so XLA overlaps
  and fuses across the boundary; boundary masking inside HiFi-GAN
  (`apply_hifigan(mel_len=...)`) makes bucket padding bit-invisible.
- `infer_tts(...)` reproduces the reference's one-shot function signature
  and behavior (constant control tensors from the breathiness/roughness/
  brightness scalars, NaN-clean + clamp before vocoding) on top of
  `Synthesizer`.

Checkpoints: native ``.spev`` (msgpack) or reference ``.pt`` (torch zip) —
auto-detected.
"""

from __future__ import annotations

import os
import threading
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from spev_tpu.config import AudioConfig, ModelConfig
from spev_tpu.models.fastspeech2 import apply_fastspeech2
from spev_tpu.models.hifigan import apply_hifigan
from spev_tpu.infer.vocoder import Vocoder
from spev_tpu.ops.griffin_lim import mel_to_audio
from spev_tpu.text.g2p import G2P
from spev_tpu.utils.platform import fetch_overlapped
from spev_tpu.errors import UserError
from spev_tpu.text.vocab import Vocab, pad_to_bucket, pick_bucket

DEFAULT_PHONEME_BUCKETS = (64, 128, 256)
DEFAULT_FRAME_BUCKETS = (256, 512, 1024, 2048)


def pcm16_host(wav: np.ndarray) -> np.ndarray:
    """float waveform → int16 PCM samples (the WAV-writer convention:
    clip to [-1, 1], scale by 32767, truncate toward zero)."""
    return (np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
            * 32767.0).astype(np.int16)


@jax.jit
def _pcm16_device(wav):
    """The same conversion on device: fetching int16 moves 4× less data
    over the device→host link than float32 (and float→int convert in XLA
    truncates toward zero, matching numpy's astype), so serving paths
    that only ship PCM bytes never pay the float transfer."""
    w = jnp.clip(wav.astype(jnp.float32), -1.0, 1.0) * 32767.0
    return w.astype(jnp.int16)


def _control(value, B: int):
    """A d/p/e control as a traced graph input: scalar (whole batch) or a
    length-B vector (per request) — broadcast as (B, 1) against (B, P)
    predictions inside the model."""
    arr = np.asarray(value, np.float32)
    if arr.ndim == 0:
        return jnp.float32(arr)
    if arr.shape != (B,):
        raise UserError(
            f"per-request control must be a scalar or a length-{B} vector; "
            f"got shape {arr.shape}"
        )
    return jnp.asarray(arr).reshape(B, 1)


def _load_any_checkpoint(path: str):
    """(params, vocab list, stats) from .spev or reference .pt."""
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint not found: {path}\n"
            "  train one first (spev-train / spev-real-metrics --mode train) "
            "or pass a reference .pt checkpoint"
        )
    if path.endswith(".spev"):
        from spev_tpu.train.checkpoint import load_params

        return load_params(path)
    from spev_tpu.train.checkpoint import import_reference_checkpoint

    params, vocab, stats, _, _ = import_reference_checkpoint(path)
    return params, vocab, stats


class Synthesizer:
    """Compiled TTS serving stack."""

    def __init__(
        self,
        checkpoint: str | tuple,
        hifigan_dir: Optional[str] = None,
        audio: AudioConfig = AudioConfig(),
        model_cfg: Optional[ModelConfig] = None,
        g2p_backend: str = "auto",
        phoneme_buckets: Sequence[int] = DEFAULT_PHONEME_BUCKETS,
        frame_buckets: Sequence[int] = DEFAULT_FRAME_BUCKETS,
        mesh=None,
    ):
        """mesh: optional ``jax.sharding.Mesh`` with a 'data' axis — batched
        serving graphs (`synthesize_batch`/`synthesize_many`) then shard
        the request batch over it (params/vocoder weights replicated, XLA
        splits the batch across chips; SURVEY §2.4 serving scale-out).
        Batch size must be a multiple of the data-axis size."""
        stored_cfg = {}
        if isinstance(checkpoint, tuple):
            params, vocab, stats = checkpoint
        else:
            params, vocab, stats = _load_any_checkpoint(checkpoint)
            from spev_tpu.train.checkpoint import load_model_config

            if checkpoint.endswith(".spev"):
                stored_cfg = load_model_config(checkpoint)
        self.params = jax.tree.map(jnp.asarray, params)
        self.vocab = Vocab(vocab)
        self.stats = stats
        self.audio = audio
        import dataclasses

        if model_cfg is None and stored_cfg:
            # reconstruct the architecture the checkpoint was trained with
            base = ModelConfig(**{k: v for k, v in stored_cfg.items()
                                  if k in ModelConfig.__dataclass_fields__})
        else:
            base = model_cfg or ModelConfig()
        self.model_cfg = dataclasses.replace(base, vocab_size=len(self.vocab))
        self.g2p = G2P(g2p_backend)
        self.vocoder = Vocoder(hifigan_dir, audio=audio)
        self.phoneme_buckets = tuple(sorted(phoneme_buckets))
        self.frame_buckets = tuple(sorted(frame_buckets))
        self.mesh = mesh
        if mesh is not None:
            # one-shot replicated placement: per-request host work is then
            # only the input arrays, never a parameter-tree walk
            from jax.sharding import NamedSharding, PartitionSpec

            self.params = jax.device_put(
                self.params, NamedSharding(mesh, PartitionSpec())
            )
        self._graphs: Dict[tuple, callable] = {}
        # graph get-or-create is locked so concurrent requests (streaming
        # handlers, the batcher worker) share ONE jitted callable per key
        # instead of racing into duplicate compilations
        self._graph_lock = threading.Lock()
        # guards the _fpp read-modify-write: concurrent server threads
        # updating the estimate must not lose an escalation-driven upward
        # jump (that would re-pay the saturate->escalate double synthesis
        # the one-sided update bounds to once)
        self._fpp_lock = threading.Lock()
        self._voc_cache: Optional[tuple] = None
        # frames-per-phoneme estimate for adaptive frame buckets: seeded from
        # the checkpoint's dataset stats when present, then tracked as a
        # running max-ratio EMA from observed batches (self-calibrating for
        # checkpoints saved before the stat existed)
        try:
            self._fpp = float((stats or {}).get("frames_per_phoneme", 10.0))
        except (TypeError, AttributeError):
            self._fpp = 10.0

    def _voc_params(self):
        """The vocoder runtime parameter tree, fetched once (and mesh-placed
        once when serving over a mesh); invalidated if the vocoder is
        swapped."""
        gen = self.vocoder.generator
        if self._voc_cache is None or self._voc_cache[0] is not gen:
            vp = gen.runtime()[1]
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                vp = jax.device_put(vp, NamedSharding(self.mesh, PartitionSpec()))
            self._voc_cache = (gen, vp)
        return self._voc_cache[1]

    def _batch_jit(self, fn, n_weights: int):
        """jit a batched serving graph; with a mesh, shard every array arg
        after the first ``n_weights`` on the 'data' axis — XLA then splits
        the batch across chips.  The weight trees themselves are placed
        (replicated) ONCE at construction / first vocoder use, so the
        per-request host work here is only the small input arrays."""
        jitted = jax.jit(fn)
        if self.mesh is None:
            return jitted
        from jax.sharding import NamedSharding, PartitionSpec as P

        bsh = NamedSharding(self.mesh, P("data"))

        def wrapped(*args):
            placed = list(args[:n_weights])  # pre-placed weight trees
            for a in args[n_weights:]:
                if hasattr(a, "ndim") and a.ndim >= 1:
                    placed.append(jax.device_put(a, bsh))
                else:
                    placed.append(a)
            return jitted(*placed)

        return wrapped

    # -- compiled graphs ----------------------------------------------------
    #
    # The acoustic model and vocoder are compiled separately: the acoustic
    # graph (cheap) always runs at the largest frame bucket; the host then
    # reads mel_len (the single device→host sync of a request) and
    # dispatches the vocoder graph compiled for the smallest sufficient
    # frame bucket — so a 40-frame utterance never pays for a 2048-frame
    # Griffin-Lim/HiFi-GAN.  For fixed-shape batched serving use
    # `synthesize_batch`, which fuses both at one static bucket.

    def _graph(self, key, build):
        """Get-or-create a cached compiled graph under the graph lock, so
        concurrent request threads share one jitted callable per key."""
        g = self._graphs.get(key)
        if g is not None:
            return g
        with self._graph_lock:
            g = self._graphs.get(key)
            if g is None:
                g = self._graphs[key] = build()
            return g

    def _acoustic_graph(self, P: int, M: int):
        import dataclasses

        def build():
            cfg = dataclasses.replace(self.model_cfg, max_phonemes=P, max_frames=M)

            @jax.jit
            def run(params, ids, lengths, breath, rough, bright, d, p, e,
                    speaker_ids=None, vad=None, nasal=None):
                kw = dict(
                    target_breath=breath, target_rough=rough, target_bright=bright,
                    d_control=d, p_control=p, e_control=e,
                )
                if nasal is not None:
                    kw["target_nasal"] = nasal
                if speaker_ids is not None or vad is not None:
                    from spev_tpu.models.advanced import apply_advanced

                    out = apply_advanced(params, cfg, ids, lengths,
                                         speaker_ids=speaker_ids, vad=vad, **kw)
                else:
                    out = apply_fastspeech2(params, cfg, ids, lengths, **kw)
                mel = out["mel_pred"]
                # reference pre-vocoder hygiene (``:776-781``)
                mel = jnp.clip(jnp.nan_to_num(mel, nan=-5.0), -10.0, 2.0)
                return mel, out["mel_len"]

            return run

        return self._graph(("ac", P, M), build)

    def _vocoder_graph(self, M: int):
        def build():
            if self.vocoder.is_neural:
                gen = self.vocoder.generator

                vapply, _ = gen.runtime()

                @jax.jit
                def run(voc_params, mel, mel_len):
                    return vapply(voc_params, mel, mel_len)

            else:

                @jax.jit
                def run(voc_params, mel, mel_len):
                    del voc_params, mel_len
                    return jax.vmap(
                        lambda m: mel_to_audio(
                            jnp.exp(m).T,
                            sr=self.audio.sample_rate,
                            n_fft=self.audio.n_fft,
                            hop_length=self.audio.hop_length,
                            fmin=self.audio.fmin,
                            fmax=self.audio.fmax,
                        )
                    )(mel)

            return run

        return self._graph(("voc", M, self.vocoder.is_neural), build)

    def _fused_graph(self, P: int, M: int):
        """Fully fused acoustic+HiFi-GAN graph at one static bucket — the
        zero-sync batched serving path (bench.py shape)."""
        import dataclasses

        def build():
            cfg = dataclasses.replace(self.model_cfg, max_phonemes=P, max_frames=M)
            gen = self.vocoder.generator
            vapply, _ = gen.runtime()

            def run(params, voc_params, ids, lengths, breath, rough, bright, d, p, e):
                out = apply_fastspeech2(
                    params, cfg, ids, lengths,
                    target_breath=breath, target_rough=rough, target_bright=bright,
                    d_control=d, p_control=p, e_control=e,
                )
                mel = jnp.clip(jnp.nan_to_num(out["mel_pred"], nan=-5.0), -10.0, 2.0)
                wav = vapply(voc_params, mel, out["mel_len"])
                return wav, mel, out["mel_len"]

            return self._batch_jit(run, n_weights=2)

        return self._graph(("fused", P, M), build)

    def _acoustic_batch_graph(self, P: int, M: int):
        """Batched acoustic-only graph with the fused graph's control
        signature — phase 1 of two-phase serving."""
        import dataclasses

        def build():
            cfg = dataclasses.replace(self.model_cfg, max_phonemes=P, max_frames=M)

            def run(params, ids, lengths, breath, rough, bright, d, p, e):
                out = apply_fastspeech2(
                    params, cfg, ids, lengths,
                    target_breath=breath, target_rough=rough, target_bright=bright,
                    d_control=d, p_control=p, e_control=e,
                )
                mel = jnp.clip(jnp.nan_to_num(out["mel_pred"], nan=-5.0), -10.0, 2.0)
                return mel, out["mel_len"]

            return self._batch_jit(run, n_weights=1)

        return self._graph(("ac-batch", P, M), build)

    # -- public API ---------------------------------------------------------

    def phonemes_to_ids(self, phones) -> np.ndarray:
        return self.vocab.encode(phones, fallback=1)

    def synthesize_batch_two_phase(
        self,
        ids_batch: np.ndarray,
        lengths: np.ndarray,
        breath: Optional[np.ndarray] = None,
        rough: Optional[np.ndarray] = None,
        bright: Optional[np.ndarray] = None,
        duration_scale: float = 1.0,
        pitch_scale: float = 1.0,
        energy_scale: float = 1.0,
        frame_bucket: Optional[int] = None,
        quantum: int = 256,
    ):
        """Batched synthesis with right-sized vocoder dispatch.

        Phase 1 runs the (cheap) acoustic graph batched at the max frame
        bucket; the host reads ``mel_len`` (ONE sync per batch); phase 2
        groups rows by their quantized frame count and runs the (expensive,
        ~94% of cost) vocoder per group at ``ceil(L/quantum)·quantum``
        frames with pow-2 batch padding — short requests stop paying for
        the 2048-frame bucket.  Returns a list of (wav, mel) rows."""
        if not self.vocoder.is_neural:
            raise ValueError("two-phase batching requires a HiFi-GAN vocoder")
        B, P = ids_batch.shape
        M = frame_bucket or self.frame_buckets[-1]
        run_ac = self._acoustic_batch_graph(P, M)
        full = lambda v: None if v is None else jnp.asarray(v)
        mel, mel_len = run_ac(
            self.params, jnp.asarray(ids_batch), jnp.asarray(lengths),
            full(breath), full(rough), full(bright),
            _control(duration_scale, B), _control(pitch_scale, B),
            _control(energy_scale, B),
        )
        lens = np.asarray(mel_len)  # the batch's single host sync (B ints)

        hop = self.vocoder.generator.cfg.hop_recovery
        voc_params = self._voc_params()
        groups: dict = {}
        for b, L in enumerate(lens):
            Mv = min(int(np.ceil(max(int(L), 1) / quantum)) * quantum, M)
            groups.setdefault(Mv, []).append(b)

        def build_gather():
            floor = self.audio.mel_clip_min

            def gather(mel, mel_len, idx, Mv):
                # device-side row gather + frame slice: only the (B,)
                # lengths cross the host boundary (tunnel RTT lesson,
                # docs/BENCH.md negative results)
                g = jnp.take(mel, idx, axis=0)[:, :Mv]
                gl = jnp.take(mel_len, idx)
                return (
                    jnp.where((jnp.arange(Mv) < gl[:, None])[..., None], g, floor),
                    gl,
                )

            return jax.jit(gather, static_argnums=(3,))

        gather = self._graph("two-phase-gather", build_gather)

        wav_groups = []
        for Mv, rows in sorted(groups.items()):
            Bp = 1 << (len(rows) - 1).bit_length()  # pow-2 pad bounds compiles
            idx = jnp.asarray(rows + [rows[-1]] * (Bp - len(rows)), jnp.int32)
            g_mel, g_len = gather(mel, mel_len, idx, Mv)
            wav_groups.append((rows, self._vocoder_graph(Mv)(voc_params, g_mel, g_len)))

        mel_np = np.asarray(mel)  # product output transfer, after dispatch
        results: list = [None] * B
        for rows, wav_dev in wav_groups:
            wav = np.asarray(wav_dev)
            for row_pos, b in enumerate(rows):
                L = int(lens[b])
                results[b] = (wav[row_pos, : L * hop], mel_np[b, :L])
        return results

    def synthesize_batch(
        self,
        ids_batch: np.ndarray,
        lengths: np.ndarray,
        breath: Optional[np.ndarray] = None,
        rough: Optional[np.ndarray] = None,
        bright: Optional[np.ndarray] = None,
        duration_scale: float = 1.0,
        pitch_scale: float = 1.0,
        energy_scale: float = 1.0,
        frame_bucket: Optional[int] = None,
    ):
        """Batched zero-host-sync synthesis (HiFi-GAN only): ids (B, P) →
        (wav (B, M·hop), mel (B, M, n_mels), mel_len (B,)) as device
        arrays; slice per sample with mel_len on the host.

        duration/pitch/energy_scale accept a scalar (whole batch) or a
        (B,)-vector (per request — mixed workloads in one batch)."""
        if not self.vocoder.is_neural:
            raise ValueError("synthesize_batch requires a HiFi-GAN vocoder")
        B, P = ids_batch.shape
        M = frame_bucket or self.frame_buckets[-1]
        run = self._fused_graph(P, M)
        full = lambda v: None if v is None else jnp.asarray(v)
        return run(
            self.params,
            self._voc_params(),
            jnp.asarray(ids_batch),
            jnp.asarray(lengths, ),
            full(breath),
            full(rough),
            full(bright),
            _control(duration_scale, B),
            _control(pitch_scale, B),
            _control(energy_scale, B),
        )

    def synthesize_ids(
        self,
        ids: np.ndarray,
        breath: Optional[np.ndarray] = None,
        rough: Optional[np.ndarray] = None,
        bright: Optional[np.ndarray] = None,
        duration_scale=1.0,
        pitch_scale=1.0,
        energy_scale=1.0,
        frame_bucket: Optional[int] = None,
        speaker_id: Optional[int] = None,
        vad: Optional[Sequence[float]] = None,
        nasal: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """ids (n_ph,) → (waveform, log-mel (L, n_mels)).

        duration/pitch/energy scales may be scalars or per-phoneme (n_ph,)
        vectors (the word-emphasis path).  speaker_id / vad engage the
        advanced model's learned conditioning (requires an advanced
        checkpoint with the corresponding tables).

        ids longer than the largest phoneme bucket are synthesized in
        bucket-sized spans (every per-phoneme track sliced consistently)
        and concatenated — this is THE over-bucket mechanism; the
        text/agent/advanced layers all inherit it."""
        n_ph = len(ids)
        p_max = self.phoneme_buckets[-1]
        if n_ph > p_max:
            def span(v, sl):
                if v is None or np.ndim(v) == 0:
                    return v
                return np.asarray(v)[sl]

            # depth-1 software pipeline over spans (cf. synthesize_many):
            # span k+1's acoustic pass is dispatched before span k's host
            # sync, so k's device->host work overlaps k+1's compute — JAX
            # dispatch is async, only the fetches block
            pending = None
            wavs, mels = [], []
            for s in range(0, n_ph, p_max):
                sl = slice(s, min(s + p_max, n_ph))
                pend = self._ids_dispatch(
                    ids[sl],
                    breath=span(breath, sl), rough=span(rough, sl),
                    bright=span(bright, sl), nasal=span(nasal, sl),
                    duration_scale=span(duration_scale, sl),
                    pitch_scale=span(pitch_scale, sl),
                    energy_scale=span(energy_scale, sl),
                    frame_bucket=frame_bucket,
                    speaker_id=speaker_id, vad=vad,
                )
                if pending is not None:
                    w, m = self._ids_finish(pending)
                    wavs.append(w)
                    mels.append(m)
                pending = pend
            w, m = self._ids_finish(pending)
            wavs.append(w)
            mels.append(m)
            return np.concatenate(wavs), np.concatenate(mels, axis=0)

        return self._ids_finish(self._ids_dispatch(
            ids, breath=breath, rough=rough, bright=bright, nasal=nasal,
            duration_scale=duration_scale, pitch_scale=pitch_scale,
            energy_scale=energy_scale, frame_bucket=frame_bucket,
            speaker_id=speaker_id, vad=vad,
        ))

    def _update_fpp(self, obs: float, escalated: bool) -> None:
        """Track the frames-per-phoneme estimate from an observed worst-row
        ratio.  ONE-SIDED on escalation: jump straight to the observation
        (+10% headroom) so a mismatched checkpoint pays the
        saturate→escalate double synthesis at most once; downward drift
        (over-allocation) relaxes via the EMA.  Locked: concurrent server
        threads must not lose an upward jump."""
        with self._fpp_lock:
            if escalated:
                self._fpp = max(self._fpp, obs * 1.1, 1.0)
            else:
                self._fpp = max(0.7 * self._fpp + 0.3 * obs * 1.1, 1.0)

    def _ids_dispatch(
        self,
        ids: np.ndarray,
        breath=None,
        rough=None,
        bright=None,
        duration_scale=1.0,
        pitch_scale=1.0,
        energy_scale=1.0,
        frame_bucket: Optional[int] = None,
        speaker_id: Optional[int] = None,
        vad: Optional[Sequence[float]] = None,
        nasal: Optional[np.ndarray] = None,
    ) -> dict:
        """Stage 1 of a single-utterance request: build padded args and
        dispatch the acoustic graph at the fpp-estimated frame bucket.
        Returns a pending record for `_ids_finish` (which syncs, handles
        escalation, runs the vocoder, and fetches)."""
        n_ph = len(ids)
        P = pick_bucket(n_ph, self.phoneme_buckets)

        def ctl(v, default):
            arr = np.full((P,), 0.0, np.float32)
            src = v if v is not None else np.full((n_ph,), default, np.float32)
            arr[:n_ph] = src
            return jnp.asarray(arr[None])

        def scale(v):
            # scalar stays scalar (trace-friendly); a vector pads to the
            # bucket (padded positions 0 -> zero duration there)
            if np.ndim(v) == 0:
                return jnp.float32(v)
            arr = np.zeros((P,), np.float32)
            arr[:n_ph] = np.asarray(v, np.float32)[:n_ph]
            return jnp.asarray(arr[None])

        args = (
            self.params,
            jnp.asarray(pad_to_bucket(ids, P, self.vocab.pad_id)[None]),
            jnp.asarray([n_ph], jnp.int32),
            ctl(breath, 0.0) if breath is not None else None,
            ctl(rough, 0.0) if rough is not None else None,
            ctl(bright, 0.0) if bright is not None else None,
            scale(duration_scale),
            scale(pitch_scale),
            scale(energy_scale),
            jnp.asarray([speaker_id], jnp.int32) if speaker_id is not None else None,
            jnp.asarray([list(vad)], jnp.float32) if vad is not None else None,
            # learned nasality control (checkpoints with cfg.use_nasality)
            ctl(nasal, 0.0) if (nasal is not None and self.model_cfg.use_nasality) else None,
        )
        # progressive bucket escalation, STARTED at the fpp-estimated
        # bucket: short requests never pay for (or compile) the largest
        # graphs, and a full-bucket span (the long-text chunking path)
        # doesn't burn runs climbing 256→512→768 when the calibrated
        # frames/phoneme estimate already says it needs the top bucket
        if frame_bucket:
            buckets = [frame_bucket]
        else:
            d_sc = float(np.max(duration_scale))
            est = int(np.ceil(n_ph * self._fpp * max(d_sc, 0.1))) + 16
            start = pick_bucket(min(est, self.frame_buckets[-1]), self.frame_buckets)
            buckets = [b for b in self.frame_buckets if b >= start]
        mel, mel_len = self._acoustic_graph(P, buckets[0])(*args)
        return {
            "args": args, "P": P, "n_ph": n_ph, "buckets": buckets,
            "frame_bucket": frame_bucket, "d_scale": float(np.max(duration_scale)),
            "mel": mel, "mel_len": mel_len,
        }

    def _ids_finish(self, pend: dict) -> Tuple[np.ndarray, np.ndarray]:
        """Stage 2: sync the frame count, escalate on saturation, calibrate
        the fpp estimate, vocode at the right-sized bucket, fetch."""
        args, P, n_ph = pend["args"], pend["P"], pend["n_ph"]
        buckets, frame_bucket = pend["buckets"], pend["frame_bucket"]
        mel, mel_len = pend["mel"], pend["mel_len"]
        for k, M_ac in enumerate(buckets):
            if k > 0:
                mel, mel_len = self._acoustic_graph(P, M_ac)(*args)
            L = int(mel_len[0])  # the request's single host sync
            if L < M_ac or M_ac == buckets[-1]:
                break
        if frame_bucket is None and L < M_ac:
            obs = L / max(n_ph, 1) / max(pend["d_scale"], 0.1)
            self._update_fpp(obs, escalated=M_ac > buckets[0])
        M_voc = pick_bucket(L, self.frame_buckets)
        # re-bucket the mel for the vocoder (floor padding ≈ silence; the
        # HiFi-GAN path additionally masks by mel_len for exact parity)
        mel_v = jnp.where(
            (jnp.arange(M_voc) < mel_len[:, None])[..., None],
            mel[:, :M_voc],
            self.audio.mel_clip_min,
        )
        hop = (
            self.vocoder.generator.cfg.hop_recovery
            if self.vocoder.is_neural
            else self.audio.hop_length
        )
        voc_params = self._voc_params() if self.vocoder.is_neural else {}
        wav = self._vocoder_graph(M_voc)(voc_params, mel_v, mel_len)
        # slice to valid length on DEVICE, then overlap the two
        # device->host copies
        wav_s, mel_s = fetch_overlapped(wav[0, : L * hop], mel[0, :L])
        return wav_s, mel_s

    def synthesize_many(
        self,
        texts: Sequence[str],
        batch_size: int = 16,
        frame_bucket: Optional[int] = None,
        two_phase: bool = False,
        want_mel: bool = True,
        pcm16: bool = False,
        **controls,
    ):
        """Batched long-form synthesis over a transcript set (the reference
        BASELINE's batched-eval configuration): texts are phonemized,
        grouped by phoneme bucket, then run through the fused zero-sync
        batched graph (default) or the two-phase path (batched acoustic +
        right-sized vocoder dispatch, ``two_phase=True``); the Griffin-Lim
        fallback stays per-request.  Returns (waveform, mel) rows in input
        order.

        two_phase trades ONE host sync per batch for vocoder right-sizing.
        On a tunneled TPU (axon) the sync RTT (~45 ms) exceeds the vocoder
        savings at 768-frame buckets, so fused wins (measured: 101 ms vs
        145 ms per batch; docs/BENCH.md negative results); on locally
        attached chips or with 2048-frame buckets and short requests,
        two_phase wins — flip it per deployment.

        When ``frame_bucket`` is None the fused path picks each group's
        frame bucket from its phoneme count (~10 frames/phoneme estimate
        scaled by duration_scale): short-request groups run small graphs
        instead of the largest bucket, with zero extra host syncs — the
        mel_len fetch that slicing needs anyway doubles as the saturation
        check, and a group whose length regulator saturated its bucket is
        re-run at the next one (rare: the estimate overshoots).

        ``want_mel=False`` returns None mel slots and ``pcm16=True``
        returns int16 waveforms, uniformly across every path.  On the
        fused batched path (the default serving configuration) both are
        applied ON DEVICE: the mel fetch is skipped and the waveform is
        converted to int16 before the device→host copy, so the serving
        condition (an HTTP endpoint ships PCM bytes and discards mel)
        moves ~4× less data over the link — the dominant residue on
        tunneled/remote devices (docs/BENCH.md).  The rarer routes
        (Griffin-Lim, over-bucket chunking, ``two_phase``) apply the same
        flags as host-side post-processing."""
        phones = [self.g2p.phonemes(t) for t in texts]
        ids_list = [self.phonemes_to_ids(p) for p in phones]
        results: list = [None] * len(texts)

        def _post(row):
            """Apply want_mel/pcm16 to a host-side (wav, mel) row (the
            Griffin-Lim, over-bucket and two-phase paths — the batched
            device path converts on device instead)."""
            wav, mel = row
            if pcm16:
                wav = pcm16_host(wav)
            return (wav, mel if want_mel else None)

        # voice-quality scalars (reference `infer_tts` surface) become
        # row-constant per-phoneme control tracks; scalar or one value per
        # text.  Scale vectors (len == len(texts)) are sliced per group.
        quality = {}
        for name, track in (("breathiness", "breath"), ("roughness", "rough"),
                            ("brightness", "bright")):
            if name in controls:
                v = np.asarray(controls.pop(name), np.float32)
                if v.ndim not in (0, 1) or (v.ndim == 1 and len(v) != len(texts)):
                    raise ValueError(
                        f"per-request {name} must be a scalar or one value "
                        f"per text ({len(texts)}); got shape {v.shape}"
                    )
                quality[track] = np.broadcast_to(v, (len(texts),))
        if not self.vocoder.is_neural:
            for i, ids in enumerate(ids_list):
                row_q = {t: np.full((len(ids),), q[i], np.float32)
                         for t, q in quality.items()}
                row_c = {
                    k: (float(np.asarray(v, np.float32)[i])
                        if k.endswith("_scale") and np.ndim(v) == 1 else v)
                    for k, v in controls.items()
                }
                results[i] = _post(self.synthesize_ids(ids, **row_q, **row_c))
            return results

        hop = self.vocoder.generator.cfg.hop_recovery
        M = frame_bucket or self.frame_buckets[-1]
        per_req = {}
        for k in ("duration_scale", "pitch_scale", "energy_scale"):
            v = controls.get(k)
            if v is not None and np.ndim(v) == 1:
                v = np.asarray(v, np.float32)
                if len(v) != len(texts):
                    raise ValueError(
                        f"per-request {k} must have one value per text "
                        f"({len(texts)}); got {len(v)}"
                    )
                per_req[k] = v
        # texts beyond the largest phoneme bucket go through synthesize_ids'
        # span chunking with the SAME control semantics as the batched rows
        # (quality tracks only when given, frame_bucket pin honored);
        # the rest batch normally
        p_cap = self.phoneme_buckets[-1]
        long_set = {i for i in range(len(texts)) if len(ids_list[i]) > p_cap}
        if long_set:
            # the over-bucket path forwards only scales + quality tracks;
            # anything else would be silently dropped for long texts while
            # in-bucket texts in the same call receive it — make the
            # divergence explicit instead (ADVICE r2)
            extra = set(controls) - {"duration_scale", "pitch_scale",
                                     "energy_scale"}
            if extra:
                raise UserError(
                    f"controls {sorted(extra)} are not supported for texts "
                    f"longer than the {p_cap}-phoneme bucket; synthesize "
                    "those via synthesize_ids directly"
                )
        for i in long_set:
            n_i = len(ids_list[i])
            row_kw = {}
            for track in ("breath", "rough", "bright"):
                if track in quality:
                    row_kw[track] = np.full((n_i,), quality[track][i], np.float32)
            for k in ("duration_scale", "pitch_scale", "energy_scale"):
                if k in per_req:
                    row_kw[k] = float(per_req[k][i])
                elif k in controls:
                    row_kw[k] = float(np.asarray(controls[k]))
            results[i] = _post(self.synthesize_ids(
                ids_list[i], frame_bucket=frame_bucket, **row_kw
            ))
        order = sorted((i for i in range(len(texts)) if i not in long_set),
                       key=lambda i: len(ids_list[i]))

        def _finish(pend):
            """Fetch a dispatched group, run the (rare) escalation loop,
            calibrate the fpp estimate, and write its results."""
            group, ids_b, lens, g_controls, M_group, outs = pend
            escalated = False
            while True:
                wav, mel, mel_len = outs
                # overlap the device->host copies (the wav alone is ~13 MB
                # at B=16/M=768 — 4× less as device-converted int16; the
                # mel copy is skipped outright when the caller discards it)
                if pcm16:
                    wav = _pcm16_device(wav)
                if want_mel:
                    wav, mel, mel_len = fetch_overlapped(wav, mel, mel_len)
                else:
                    wav, mel_len = fetch_overlapped(wav, mel_len)
                # mel_len == bucket ⇒ the length regulator may have
                # truncated: escalate (unless already at the largest
                # bucket or the caller pinned one)
                if (frame_bucket is not None
                        or M_group >= self.frame_buckets[-1]
                        or (mel_len < M_group).all()):
                    break
                escalated = True
                M_group = self.frame_buckets[self.frame_buckets.index(M_group) + 1]
                outs = self.synthesize_batch(
                    ids_b, lens, frame_bucket=M_group, **g_controls
                )
            # calibrate the frames/phoneme estimate from unsaturated rows
            # (saturated rows are truncated, so their ratio understates)
            ok = mel_len < M_group
            if frame_bucket is None and ok.any():
                d_scale = float(np.max(g_controls.get("duration_scale", 1.0)))
                obs = float(np.max(mel_len[ok] / np.maximum(lens[ok], 1)))
                self._update_fpp(obs / max(d_scale, 0.1), escalated=escalated)
            for row, i in enumerate(group):
                L = int(mel_len[row])
                results[i] = (wav[row, : L * hop],
                              mel[row, :L] if want_mel else None)

        # depth-1 software pipeline: group k+1 is DISPATCHED before group
        # k's outputs are fetched, so k's device->host transfer overlaps
        # k+1's compute (JAX dispatch is async; only np.asarray blocks).
        # Depth 1 keeps the fpp calibration loop mostly honest: group k+1
        # picks its bucket with the estimate updated through group k-1.
        pending = None
        for start in range(0, len(order), batch_size):
            group = order[start : start + batch_size]
            P = pick_bucket(max(len(ids_list[i]) for i in group), self.phoneme_buckets)
            g_controls = {**controls,
                          **{k: v[group] for k, v in per_req.items()},
                          **{t: np.repeat(q[group][:, None], P, axis=1)
                             for t, q in quality.items()}}
            ids_b = np.stack([pad_to_bucket(ids_list[i], P, self.vocab.pad_id) for i in group])
            lens = np.asarray([len(ids_list[i]) for i in group], np.int32)
            if two_phase:
                rows = self.synthesize_batch_two_phase(
                    ids_b, lens, frame_bucket=M, **g_controls
                )
                for row, i in enumerate(group):
                    results[i] = _post(rows[row])
                continue
            if frame_bucket is None:
                d_scale = float(np.max(g_controls.get("duration_scale", 1.0)))
                # frames/phoneme: checkpoint-calibrated + EMA-tracked
                # (the old constant 10 forced saturation→escalation on
                # checkpoints trained to longer durations and
                # over-allocated on shorter ones)
                est = int(np.ceil(int(lens.max()) * self._fpp
                                  * max(d_scale, 0.1))) + 16
                M_group = pick_bucket(
                    min(est, self.frame_buckets[-1]), self.frame_buckets
                )
            else:
                M_group = M
            outs = self.synthesize_batch(
                ids_b, lens, frame_bucket=M_group, **g_controls
            )
            if pending is not None:
                _finish(pending)
            pending = (group, ids_b, lens, g_controls, M_group, outs)
        if pending is not None:
            _finish(pending)
        return results

    def synthesize(
        self,
        text: str,
        breathiness: float = 0.1,
        roughness: float = 0.05,
        brightness: float = 0.0,
        pitch_scale: float = 1.0,
        duration_scale: float = 1.0,
        energy_scale: float = 1.0,
        breath_curve: Optional[np.ndarray] = None,
        rough_curve: Optional[np.ndarray] = None,
        bright_curve: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Reference-equivalent synthesis: constant control tensors from the
        scalars (``:758-760``), or explicit per-phoneme curves (the temporal
        agent path).

        Text longer than the largest phoneme bucket is handled by
        `synthesize_ids`' span chunking (curves included)."""
        phones = self.g2p.phonemes(text)
        ids = self.phonemes_to_ids(phones)
        n = len(ids)

        def curve(c, scalar):
            if c is not None:
                return np.asarray(c, np.float32)[:n]
            return np.full((n,), scalar, np.float32)

        return self.synthesize_ids(
            ids,
            breath=curve(breath_curve, breathiness),
            rough=curve(rough_curve, roughness),
            bright=curve(bright_curve, brightness),
            duration_scale=duration_scale,
            pitch_scale=pitch_scale,
            energy_scale=energy_scale,
        )


def infer_tts(
    checkpoint_path: str,
    text: str,
    breathiness: float = 0.1,
    roughness: float = 0.05,
    brightness: float = 0.0,
    pitch_scale: float = 1.0,
    duration_scale: float = 1.0,
    energy_scale: float = 1.0,
    hifigan_dir: str = "./hifi-gan",
) -> Tuple[np.ndarray, np.ndarray]:
    """One-shot inference matching the reference function signature
    (``spev_real_metrics.py:738-787``).  Returns (waveform, mel as
    (L, n_mels)).  For serving, construct a `Synthesizer` once instead."""
    synth = Synthesizer(checkpoint_path, hifigan_dir=hifigan_dir)
    return synth.synthesize(
        text,
        breathiness=breathiness,
        roughness=roughness,
        brightness=brightness,
        pitch_scale=pitch_scale,
        duration_scale=duration_scale,
        energy_scale=energy_scale,
    )
