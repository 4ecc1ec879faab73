"""Feature extraction and dataset cache.

Reference pipeline (``spev_real_metrics.py:282-462``), reproduced with the
framework's own DSP kernels (librosa-free):

1. **Stats pass** over ≤500 random wavs: voiced log-F0 (pyin, hop 512 — the
   pyin default the reference hits by omitting hop_length at ``:311``),
   log-RMS, log spectral centroid → global means/stds (+1e-5 on stds).
2. **Per-file pass**: load 22.05 kHz mono (skip < 4000 samples), durations
   from MFA TextGrids (``phones``/``phonemes`` tier) or G2P fallback with
   uniform durations; log-mel (80, fmax=sr/2 — librosa default the
   reference uses by omission, NOT its CONFIG fmax); F0/RMS/centroid at hop
   256; the reference's exact duration-rescale-to-mel-length algorithm
   (remainder to the last phoneme / trimmed from the tail); per-phoneme
   z-scored + clipped targets:
   pitch = mean voiced log-F0 (clip ±2.5), energy = mean log-RMS (±2.5),
   breath = 1 − mean(voiced_prob) ([0, 0.8]), rough = std voiced log-F0
   ([0, 1.5]), bright = z-scored mean log-centroid (±2.5)  (SURVEY.md §2.2).
3. Cache: per-utterance ``u_{i:05d}.npz`` + ``metadata.json`` with files,
   stats, vocab (sorted union with specials).

DSP runs through jitted kernels; signals are padded to 8192-sample buckets
so each bucket compiles once (frame counts are computed from the true
length; the final 1-2 frames of a bucket-padded signal can differ slightly
from an exact-length run — irrelevant after per-corpus z-scoring).
"""

from __future__ import annotations

import glob
import json
import os
import random
import shutil
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from spev_tpu.config import AudioConfig
from spev_tpu.ops.features import pyin_f0, rms_energy, spectral_centroid, yin_f0
from spev_tpu.ops.stft import log_mel_spectrogram
from spev_tpu.errors import UserError
from spev_tpu.text.g2p import G2P
from spev_tpu.text.textgrid import intervals_to_durations, phone_intervals
from spev_tpu.text.vocab import SPECIALS
from spev_tpu.utils.platform import fetch_overlapped, on_tpu
from spev_tpu.utils.wavio import read_wav, resample_linear

_SIG_BUCKET = 8192


class FeatureExtractor:
    """Jitted per-signal DSP with signal-length bucketing.

    use_pallas: 'auto' (fused Pallas log-mel kernel on TPU — ~9× the XLA
    path — XLA elsewhere), True, or False."""

    def __init__(self, audio: AudioConfig = AudioConfig(), use_pallas="auto"):
        self.audio = audio
        self._full = {}
        self._stats_fn = {}
        self._mel_jit = None
        self.use_pallas = on_tpu() if use_pallas == "auto" else bool(use_pallas)

    def _mel_fn(self, a):
        if self.use_pallas:
            from spev_tpu.ops.pallas.kernels import fused_log_mel

            return lambda y: fused_log_mel(
                y, sr=a.sample_rate, n_fft=a.n_fft, hop_length=a.hop_length,
                n_mels=a.n_mels, fmin=0.0, fmax=a.sample_rate / 2,
                floor=a.mel_floor, clip_min=a.mel_clip_min, clip_max=a.mel_clip_max,
            )
        return lambda y: log_mel_spectrogram(
            y, sr=a.sample_rate, n_fft=a.n_fft, hop_length=a.hop_length,
            n_mels=a.n_mels, fmin=0.0, fmax=a.sample_rate / 2,
            floor=a.mel_floor, clip_min=a.mel_clip_min, clip_max=a.mel_clip_max,
        )

    def _f0_fn(self, a, hop_length: int):
        # 'pyin' = the reference's extractor semantics (full candidate-lattice
        # HMM, librosa.pyin); 'yin_lite' = fast best-trough path.
        if getattr(a, "f0_method", "pyin") == "pyin":
            return lambda y: pyin_f0(
                y, sr=a.sample_rate, fmin=a.f0_min, fmax=a.f0_max, hop_length=hop_length
            )
        return lambda y: yin_f0(
            y, sr=a.sample_rate, fmin=a.f0_min, fmax=a.f0_max, hop_length=hop_length
        )

    def _get_full(self, n: int):
        if n not in self._full:
            a = self.audio
            mel_fn = self._mel_fn(a)
            f0_fn = self._f0_fn(a, a.hop_length)

            @jax.jit
            def run(y):
                mel = mel_fn(y)
                f0, _, vprob = f0_fn(y)
                rms = rms_energy(y, hop_length=a.hop_length)
                cent = spectral_centroid(y, sr=a.sample_rate, hop_length=a.hop_length)
                return mel, f0, vprob, rms, cent

            self._full[n] = run
        return self._full[n]

    def _get_stats(self, n: int):
        if n not in self._stats_fn:
            a = self.audio
            # stats pass uses the pyin default hop (frame_length//4 = 512)
            f0_fn = self._f0_fn(a, 512)

            @jax.jit
            def run(y):
                f0, _, _ = f0_fn(y)
                rms = rms_energy(y, hop_length=a.hop_length)
                cent = spectral_centroid(y, sr=a.sample_rate, hop_length=a.hop_length)
                return f0, rms, cent

            self._stats_fn[n] = run
        return self._stats_fn[n]

    @staticmethod
    def _bucket(y: np.ndarray):
        n = ((len(y) + _SIG_BUCKET - 1) // _SIG_BUCKET) * _SIG_BUCKET
        return np.pad(y.astype(np.float32), (0, n - len(y))), n

    def mel(self, y: np.ndarray) -> np.ndarray:
        """Mel only — identical to ``full_features(y)[0]`` but skips the
        pyin/RMS/centroid kernels (the GAN vocoder trainer needs just the
        conditioning mel; pyin is the extractor's most expensive kernel)."""
        if self._mel_jit is None:
            self._mel_jit = jax.jit(self._mel_fn(self.audio))
        ypad, _ = self._bucket(y)
        m = np.asarray(self._mel_jit(jnp.asarray(ypad)))
        return m[:, : 1 + len(y) // self.audio.hop_length]

    def full_features(self, y: np.ndarray):
        """(mel (n_mels, T), f0, voiced_prob, log_rms, centroid) with frame
        counts trimmed to the true signal length."""
        a = self.audio
        ypad, n = self._bucket(y)
        mel, f0, vprob, rms, cent = fetch_overlapped(*self._get_full(n)(jnp.asarray(ypad)))
        t = 1 + len(y) // a.hop_length
        return (
            mel[:, :t],
            f0[:t],
            vprob[:t],
            np.log(rms[:t] + 1e-6),
            cent[:t],
        )

    def stats_features(self, y: np.ndarray):
        ypad, n = self._bucket(y)
        f0, rms, cent = fetch_overlapped(*self._get_stats(n)(jnp.asarray(ypad)))
        t256 = 1 + len(y) // self.audio.hop_length
        t512 = 1 + len(y) // 512
        return f0[:t512], rms[:t256], cent[:t256]


def _rescale_durations(durs: List[int], phs: List[str], target: int):
    """The reference's exact rescale algorithm (``:373-397``): scale each
    duration (min 1), add remainder to the last phoneme or trim from the
    tail, dropping emptied phonemes.  Returns (phs, durs) or None on the
    reference's bail conditions."""
    total = sum(durs)
    if total <= 0:
        return None
    scale = target / total
    new = [max(1, int(d * scale)) for d in durs]
    phs = list(phs)
    cur = sum(new)
    if cur < target:
        new[-1] += target - cur
    elif cur > target:
        diff = cur - target
        while diff > 0 and new:
            if new[-1] > diff:
                new[-1] -= diff
                diff = 0
            else:
                diff -= new[-1]
                new.pop()
                phs.pop()
                if not new:
                    break
    if not new or sum(new) != target:
        return None
    return phs, new


# ---------------------------------------------------------------------------
# parallel pass-2 workers (module-level for spawn picklability)
# ---------------------------------------------------------------------------

_BUILD_WORKER: dict = {}


def _build_worker_init(audio, stats, cache_dir, g2p_backend, textgrid_dir,
                       min_samples, emotion_vad):
    """Once per worker process: pin the CPU backend (the axon sitecustomize
    re-applies the TPU platform in every fresh interpreter, and the single
    relay-tunneled chip cannot be shared by N extraction processes), then
    build the per-process extractor/G2P."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    ds = SpevDataset.__new__(SpevDataset)
    ds.audio = audio
    ds.cache_dir = cache_dir
    ds.multi_speaker = False
    ds.emotion_vad = emotion_vad
    ds.stats = stats
    ds._emotion_counts = {}
    _BUILD_WORKER.update(
        ds=ds,
        fx=FeatureExtractor(audio, use_pallas=False),
        g2p=G2P(g2p_backend),
        textgrid_dir=textgrid_dir,
        min_samples=min_samples,
    )


def _build_worker_run(item):
    """(i, wav_path) → (i, status, payload): status 'ok' carries
    (npz_path, phonemes, n_frames); 'skip' is a too-short/unparseable file;
    'error' carries the repr for the parent's error accounting."""
    i, wav_path = item
    w = _BUILD_WORKER
    try:
        entry = w["ds"]._process_file(
            i, wav_path, w["textgrid_dir"], w["fx"], w["g2p"], w["min_samples"]
        )
    except Exception as e:  # parent replicates the serial path's accounting
        return i, "error", f"{e!r}"
    if entry is None:
        return i, "skip", None
    path, phs, n_frames = entry
    return i, "ok", (path, [str(p) for p in phs], int(n_frames))


class SpevDataset:
    """Two-pass preprocessed dataset with per-utterance npz cache."""

    def __init__(
        self,
        data_dir: str,
        textgrid_dir: Optional[str] = None,
        cache_dir: str = "cache_spev",
        audio: AudioConfig = AudioConfig(),
        g2p_backend: str = "auto",
        force_rebuild: bool = False,
        stats_sample: int = 500,
        min_samples: int = 4000,
        seed: int = 1234,
        multi_speaker: bool = False,
        emotion_vad: bool = False,
        build_workers: int = 1,
    ):
        """multi_speaker: derive a speaker label from each basename's prefix
        before the first '_' (the LibriTTS-R convention; SURVEY.md §2.7
        multi-speaker stretch) and store per-utterance speaker indices.

        emotion_vad: derive an emotion label from each basename's
        ``*_{emotion}`` suffix (the ESD prepper convention,
        `data.downloaders.prep_esd`) and store a per-utterance (3,) VAD
        target via the fixed table `data.emotion.EMOTION_VAD` — the label
        source that makes the advanced model's ``vad_proj`` trainable
        (reference ``PRODUCTION_SYSTEM_SUMMARY.md:71-82,124-133``).
        Unlabeled utterances get the neutral (0,0,0) target.

        build_workers: feature-extraction processes for pass 2.  The
        per-file extraction (pyin HMM is the dominant kernel) is
        embarrassingly parallel once the stats pass has fixed the
        normalization constants, but each utterance's device graph is
        serial — >1 spawns worker processes that share the stats and
        write the same ``u_{i:05d}.npz`` layout
        (tests/test_data.py::test_parallel_build_matches_serial pins the
        cache equivalence).  Workers run on CPU: corpus preprocessing
        without an accelerator is a host-side pipeline, and the parent's
        TPU handle is not shareable across processes — on a TPU host
        prefer the serial build, whose jitted per-bucket feature graph
        is ~75 ms/utterance through the relay (docs/BENCH.md §Corpus
        preprocessing)."""
        self.audio = audio
        self.cache_dir = cache_dir
        self.multi_speaker = multi_speaker
        self.emotion_vad = emotion_vad
        meta_path = os.path.join(cache_dir, "metadata.json")

        if force_rebuild and os.path.exists(cache_dir):
            shutil.rmtree(cache_dir)
        os.makedirs(cache_dir, exist_ok=True)

        if os.path.exists(meta_path) and not force_rebuild:
            with open(meta_path) as f:
                meta = json.load(f)
            # an empty file list is never a valid cache of a real corpus —
            # it is the footprint of a build that crashed mid-extraction
            # (e.g. device died) in an older version; rebuild instead of
            # silently training on nothing
            if meta["files"]:
                if emotion_vad and "emotions" not in meta:
                    raise UserError(
                        f"cache at {cache_dir} was built without emotion-VAD "
                        "labels; rebuild it (force_rebuild=True / "
                        "--force_rebuild) to train the VAD pathway"
                    )
                self.files = meta["files"]
                self.stats = meta["stats"]
                self.vocab = meta["vocab"]
                self.speakers = meta.get("speakers", [])
                self.emotions = meta.get("emotions", [])
                # per-utterance (n_phonemes, n_frames); caches built before
                # the field existed return None and callers fall back to
                # loading
                self.lengths = meta.get("lengths")
                return

        fx = FeatureExtractor(audio)
        g2p = G2P(g2p_backend)
        self._emotion_counts: dict = {}
        wavs = sorted(
            glob.glob(os.path.join(os.path.abspath(data_dir), "**", "*.wav"), recursive=True)
        )
        if not wavs:
            raise FileNotFoundError(f"no wavs under {data_dir}")

        # ---- pass 1: stats -------------------------------------------------
        rng = random.Random(seed)
        sample = rng.sample(wavs, min(len(wavs), stats_sample))
        all_p, all_e, all_c = [], [], []
        stats_errors, stats_first = 0, None
        for w in sample:
            try:
                y = self._load(w)
                if len(y) < min_samples:
                    continue
                f0, rms, cent = fx.stats_features(y)
                logf0 = np.log(np.nan_to_num(f0, nan=1e-8) + 1e-8)
                all_p.extend(logf0[logf0 > -5].tolist())
                all_e.extend(np.log(rms + 1e-6).tolist())
                all_c.extend(np.log(cent + 1e-8).tolist())
            except Exception as e:
                # per-file errors must not kill the stats pass (reference
                # behavior) but silent skips skew the normalization stats —
                # account for them and warn (pass 2 fails loudly if the
                # cause is systemic, since it uses the same extractor)
                stats_errors += 1
                if stats_first is None:
                    stats_first = (w, e)
                continue
        if stats_errors:
            print(
                f"Warning: stats pass skipped {stats_errors}/{len(sample)} "
                f"files on errors; first ({os.path.basename(stats_first[0])}): "
                f"{stats_first[1]!r}"
            )
        self.stats = {
            "p_mean": float(np.mean(all_p)) if all_p else 0.0,
            "p_std": float(np.std(all_p)) + 1e-5 if all_p else 1.0,
            "e_mean": float(np.mean(all_e)) if all_e else 0.0,
            "e_std": float(np.std(all_e)) + 1e-5 if all_e else 1.0,
            "c_mean": float(np.mean(all_c)) if all_c else 0.0,
            "c_std": float(np.std(all_c)) + 1e-5 if all_c else 1.0,
        }

        # ---- pass 2: per-file features ------------------------------------
        vocab_set = set(SPECIALS)
        speaker_set = set()
        self.files = []
        self.lengths = []
        entries = []
        tot_frames = tot_phonemes = 0
        n_errors, first_error = 0, None
        if build_workers > 1:
            results = self._parallel_extract(
                wavs, textgrid_dir, g2p_backend, min_samples, build_workers
            )
        else:
            results = self._serial_extract(wavs, textgrid_dir, fx, g2p, min_samples)
        for i, status, payload in results:
            wav_path = wavs[i]
            if status == "error":
                # one bad file must not kill a corpus build, but errors must
                # not vanish either: count them, keep the first, and fail
                # loudly below if EVERY file errored (systemic cause, e.g.
                # the device died mid-extraction)
                n_errors += 1
                if first_error is None:
                    first_error = (wav_path, payload)
                continue
            if status == "skip":
                continue
            path, phs, n_frames = payload
            if self.emotion_vad and build_workers > 1:
                # the serial path counts emotions inside _process_file;
                # worker-side counts die with the workers, so recount here
                from spev_tpu.data.emotion import emotion_from_basename

                emo = emotion_from_basename(
                    os.path.splitext(os.path.basename(wav_path))[0]) or "neutral"
                self._emotion_counts[emo] = self._emotion_counts.get(emo, 0) + 1
            tot_frames += n_frames
            tot_phonemes += len(phs)
            vocab_set.update(phs)
            self.files.append(path)
            self.lengths.append((len(phs), int(n_frames)))
            if multi_speaker:
                spk = os.path.basename(wav_path).split("_")[0]
                speaker_set.add(spk)
                entries.append((path, spk))
        if n_errors and first_error is not None:
            if not self.files:
                cause = first_error[1] if isinstance(first_error[1], BaseException) else None
                raise RuntimeError(
                    f"all {n_errors} wav files under {data_dir} failed feature "
                    f"extraction; first error ({first_error[0]}): {first_error[1]!r}"
                ) from cause
            print(
                f"Warning: skipped {n_errors}/{len(wavs)} files on errors; "
                f"first ({os.path.basename(first_error[0])}): {first_error[1]!r}"
            )
        if not self.files:
            # zero usable utterances with zero errors (e.g. every wav under
            # min_samples) must fail HERE: training on nothing is useless,
            # and writing files=[] metadata would trip the crash-footprint
            # check above and silently re-extract the corpus on every
            # construction
            raise UserError(
                f"no usable utterances under {data_dir}: all {len(wavs)} wavs "
                f"were skipped (shorter than {min_samples} samples or empty)"
            )

        # serving-side frame-bucket calibration: the corpus' mean decoded
        # frames per phoneme rides in stats → checkpoint → Synthesizer,
        # replacing its hard-coded 10-frames/phoneme estimate
        self.stats["frames_per_phoneme"] = (
            tot_frames / tot_phonemes if tot_phonemes else 10.0
        )
        self.vocab = sorted(vocab_set)
        self.speakers = sorted(speaker_set)
        self.emotions = sorted(self._emotion_counts)
        if multi_speaker:
            spk_to_id = {s: i for i, s in enumerate(self.speakers)}
            for path, spk in entries:
                with np.load(path, allow_pickle=True) as u:
                    data = {k: u[k] for k in u.files}
                data.pop("allow_pickle", None)
                data["speaker_id"] = np.int32(spk_to_id[spk])
                np.savez(path, **data)
        # store basenames so the cache is relocatable / cwd-independent
        self.files = [os.path.basename(p) for p in self.files]
        # atomic write: a crash mid-dump must not leave a truncated (or
        # empty) metadata.json that a later run would trust
        tmp_path = meta_path + ".tmp"
        meta_out = {"files": self.files, "stats": self.stats, "vocab": self.vocab,
                    "speakers": self.speakers, "lengths": self.lengths}
        if emotion_vad:
            meta_out["emotions"] = self.emotions
            meta_out["emotion_counts"] = self._emotion_counts
        with open(tmp_path, "w") as f:
            json.dump(meta_out, f)
        os.replace(tmp_path, meta_path)

    def _serial_extract(self, wavs, textgrid_dir, fx, g2p, min_samples):
        """Pass-2 generator, one file at a time on the parent's backend,
        with a one-ahead wav prefetch: decode utterance i+1 on a worker
        thread while the device runs utterance i's feature graph (the
        decode + resample is pure host work and otherwise serializes the
        build).  Yields the same (i, status, payload) rows as the
        parallel path."""
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="spev-build")
        pre = pool.submit(self._load, wavs[0])
        for i, wav_path in enumerate(wavs):
            try:
                try:
                    y = pre.result()
                    y_err = None
                except Exception as e:  # decode failure: surface below
                    y, y_err = None, e
                if i + 1 < len(wavs):
                    pre = pool.submit(self._load, wavs[i + 1])
                if y_err is not None:
                    raise y_err
                entry = self._process_file(
                    i, wav_path, textgrid_dir, fx, g2p, min_samples, y=y
                )
            except Exception as e:
                yield i, "error", e
                continue
            if entry is None:
                yield i, "skip", None
            else:
                yield i, "ok", entry
        pool.shutdown(wait=False)

    def _parallel_extract(self, wavs, textgrid_dir, g2p_backend, min_samples,
                          build_workers):
        """Pass-2 over spawned CPU worker processes (see __init__ doc).
        ``spawn`` (not fork): the parent may hold a live TPU backend, and
        forked JAX state is unsafe."""
        import multiprocessing
        from concurrent.futures import ProcessPoolExecutor

        ctx = multiprocessing.get_context("spawn")
        with ProcessPoolExecutor(
            max_workers=build_workers,
            mp_context=ctx,
            initializer=_build_worker_init,
            initargs=(self.audio, self.stats, self.cache_dir, g2p_backend,
                      textgrid_dir, min_samples, self.emotion_vad),
        ) as ex:
            yield from ex.map(_build_worker_run, enumerate(wavs), chunksize=4)

    def _load(self, path: str) -> np.ndarray:
        # native C++ decoder when built (falls back to the Python reader)
        from spev_tpu.utils import native

        y, sr = native.read_wav(path)
        if sr != self.audio.sample_rate:
            y = resample_linear(y, sr, self.audio.sample_rate)
        return y

    def _process_file(self, i, wav_path, textgrid_dir, fx, g2p, min_samples, y=None):
        if y is None:
            y = self._load(wav_path)
        if len(y) < min_samples:
            return None
        basename = os.path.splitext(os.path.basename(wav_path))[0]

        phs, durs = [], []
        if textgrid_dir:
            cands = glob.glob(
                os.path.join(textgrid_dir, "**", f"{basename}.TextGrid"), recursive=True
            )
            if cands:
                try:
                    ivs = phone_intervals(cands[0])
                    if ivs:
                        phs, durs = intervals_to_durations(
                            ivs, self.audio.sample_rate, self.audio.hop_length
                        )
                except Exception:
                    pass
        if not phs:
            txt_path = os.path.splitext(wav_path)[0] + ".txt"
            if os.path.exists(txt_path):
                with open(txt_path) as f:
                    text = f.read().strip()
                phs = g2p.phonemes(text)
                durs = [int((len(y) / self.audio.hop_length) / len(phs))] * len(phs)
        if not phs:
            return None

        mel, f0, vprob, log_rms, cent = fx.full_features(y)
        min_l = min(mel.shape[1], len(f0), len(log_rms))
        mel = mel[:, :min_l]

        res = _rescale_durations(durs, phs, min_l)
        if res is None:
            return None
        phs, durs = res

        logf0 = np.log(np.nan_to_num(f0, nan=1e-8) + 1e-8)
        logcent = np.log(cent + 1e-8)
        # nasality proxy: nasal resonance ≙ mid-frequency boost with
        # high-frequency attenuation (PRODUCTION_SYSTEM_SUMMARY.md:64-69), so
        # the per-frame spectral-tilt difference mid-band − high-band of the
        # log-mel is the formant-proxy target; normalized per utterance to
        # [0, 1] (relative nasality — no global stats pass needed)
        nm = mel.shape[0]
        tilt = mel[nm // 4 : nm // 2].mean(axis=0) - mel[(11 * nm) // 16 :].mean(axis=0)
        s = self.stats
        p, e, br, ro, bri, na = [], [], [], [], [], []
        tilt_mu, tilt_sd = float(tilt.mean()), float(tilt.std()) + 1e-5
        cur = 0
        for d in durs:
            sl = slice(cur, cur + d)
            seg = logf0[sl]
            voiced = seg[seg > -5]
            p_val = (voiced.mean() - s["p_mean"]) / s["p_std"] if voiced.size else 0.0
            p.append(np.clip(p_val, -2.5, 2.5))
            e.append(np.clip((log_rms[sl].mean() - s["e_mean"]) / s["e_std"], -2.5, 2.5))
            br.append(np.clip(1.0 - vprob[sl].mean(), 0.0, 0.8))
            ro.append(np.clip(voiced.std() if voiced.size else 0.0, 0.0, 1.5))
            bri.append(np.clip((logcent[sl].mean() - s["c_mean"]) / s["c_std"], -2.5, 2.5))
            na.append(np.clip(0.5 + 0.25 * (tilt[sl].mean() - tilt_mu) / tilt_sd, 0.0, 1.0))
            cur += d

        extra = {}
        if self.emotion_vad:
            from spev_tpu.data.emotion import (EMOTION_VAD,
                                               emotion_from_basename)

            emo = emotion_from_basename(basename) or "neutral"
            self._emotion_counts[emo] = self._emotion_counts.get(emo, 0) + 1
            extra["vad"] = np.asarray(EMOTION_VAD[emo], np.float32)
        path = os.path.join(self.cache_dir, f"u_{i:05d}.npz")
        np.savez(
            path,
            **extra,
            phs=np.asarray(phs, dtype=object),
            durs=np.asarray(durs, np.int32),
            mel=mel.T.astype(np.float32),  # (T, n_mels) like the reference cache
            pitch=np.asarray(p, np.float32),
            energy=np.asarray(e, np.float32),
            breath=np.asarray(br, np.float32),
            rough=np.asarray(ro, np.float32),
            bright=np.asarray(bri, np.float32),
            nasal=np.asarray(na, np.float32),
        )
        return path, phs, int(np.sum(durs))

    def __len__(self):
        return len(self.files)

    def _resolve(self, entry: str) -> str:
        # metadata stores basenames (portable across cwd); tolerate full
        # paths from older caches
        if os.path.exists(entry):
            return entry
        return os.path.join(self.cache_dir, os.path.basename(entry))

    def load_utterance(self, idx: int) -> dict:
        u = np.load(self._resolve(self.files[idx]), allow_pickle=True)
        return {k: u[k] for k in u.files if k != "allow_pickle"}
