"""Objective quality evaluation of an acoustic checkpoint on a corpus.

The reference documents quality targets it never measures
(``PRODUCTION_SYSTEM_SUMMARY.md:227-231``: MCD < 6.0 dB, duration error
< 10%).  The trainer's per-epoch dashboard measures them on one val batch;
this module measures them over a WHOLE corpus (or split) for any
checkpoint, after the fact — the missing "how good is this model really"
surface (CLI: ``spev-eval`` / ``python -m spev_tpu.cli.evaluate``).

Per utterance: teacher-forced mel MCD (predicted vs ground-truth mel,
frame-aligned because durations are cache-rescaled to the mel length),
per-phoneme duration error (decoded predicted durations vs targets, the
reference's decode: ``round(clamp(exp(log_d)-1, 0, 500))``,
``spev_real_metrics.py:215``), and per-phoneme F0 RMSE in Hz — predicted
and target pitch are z-scored voiced log-F0 means
(``spev_real_metrics.py:409-411``), so the checkpoint's stats denormalize
both to Hz (``exp(z·p_std + p_mean)``) with no vocoding; phonemes whose
target had no voiced frames (stored as exactly 0.0 z) are excluded.
"""

from __future__ import annotations

import dataclasses
import statistics
from typing import Dict, Optional, Sequence

import numpy as np
import jax

from spev_tpu.config import ModelConfig
from spev_tpu.models.fastspeech2 import apply_fastspeech2
from spev_tpu.text.vocab import Vocab, pick_bucket

_FX: list = [None]  # lazy FeatureExtractor for vocoded scoring


def evaluate_checkpoint(
    checkpoint: str,
    ds,
    indices: Optional[Sequence[int]] = None,
    model_cfg: Optional[ModelConfig] = None,
    batch_size: int = 8,
    phoneme_buckets: Sequence[int] = (64, 128, 256),
    frame_buckets: Sequence[int] = (256, 512, 1024, 2048),
    vocoder=None,
) -> dict:
    """Evaluate ``checkpoint`` on utterances ``indices`` of ``ds`` (all by
    default).  Returns ``{"per_utterance": {i: {mcd_db, dur_err_pct,
    frames}}, "aggregate": {...}, "skipped": [...]}``; aggregate carries
    mean/median MCD, mean duration error, and pass flags vs the
    reference's documented targets.

    With ``vocoder`` (a `spev_tpu.infer.vocoder.Vocoder`), each
    teacher-forced predicted mel is also VOCODED and the waveform's
    re-extracted mel scored against the ground-truth mel
    (``vocoded_mcd_db``) — the serving condition: what a listener hears,
    including the acoustic→vocoder mismatch that GTA fine-tuning targets
    (docs/QUALITY.md)."""
    from spev_tpu.data.batching import collate
    from spev_tpu.diag.quality import duration_error_pct, mel_cepstral_distortion
    from spev_tpu.infer.synthesis import _load_any_checkpoint
    from spev_tpu.train.checkpoint import load_model_config

    params, vocab_list, stats = _load_any_checkpoint(checkpoint)
    vocab = Vocab(vocab_list)
    p_stats = None
    if stats and "p_mean" in stats and "p_std" in stats:
        p_stats = (float(stats["p_mean"]), float(stats["p_std"]))
    if model_cfg is None:
        stored = load_model_config(checkpoint) if str(checkpoint).endswith(".spev") else {}
        base = ModelConfig(**stored) if stored else ModelConfig()
        model_cfg = dataclasses.replace(base, vocab_size=len(vocab))

    if indices is None:
        indices = range(len(ds))
    lengths = getattr(ds, "lengths", None)
    groups: Dict[tuple, list] = {}
    skipped = []
    for i in indices:
        if lengths is not None and i < len(lengths) and lengths[i] is not None:
            n, t = int(lengths[i][0]), int(lengths[i][1])
        else:
            u = ds.load_utterance(i)
            n, t = len(u["phs"]), int(u["mel"].shape[0])
        try:
            key = (pick_bucket(n, phoneme_buckets), pick_bucket(t, frame_buckets))
        except ValueError:
            skipped.append(i)
            continue
        groups.setdefault(key, []).append(i)

    fwd_cache: Dict[tuple, object] = {}
    multi_speaker = "advanced" in params and "speaker_embedding" in params["advanced"]
    # emotion-conditioned (use_vad) checkpoints must evaluate WITH their
    # VAD conditioning, exactly as training did — without it the learned
    # register shifts score as error (the per-emotion QUALITY.md rows)
    use_vad = "advanced" in params and "vad_proj" in params["advanced"]

    def get_fwd(P: int, M: int):
        if (P, M) not in fwd_cache:
            cfg_pm = dataclasses.replace(model_cfg, max_phonemes=P, max_frames=M)

            def fwd(p, ids, lens, durs, pitch, energy, breath, rough, bright,
                    nasal, speaker_ids, vad):
                kw = dict(
                    target_durations=durs, target_pitch=pitch,
                    target_energy=energy, target_breath=breath,
                    target_rough=rough, target_bright=bright,
                    target_nasal=nasal, deterministic=True,
                )
                if speaker_ids is not None or vad is not None:
                    # multi-speaker / emotion checkpoints condition through
                    # the advanced wrapper, exactly as training did
                    from spev_tpu.models.advanced import apply_advanced

                    out = apply_advanced(p, cfg_pm, ids, lens,
                                         speaker_ids=speaker_ids, vad=vad,
                                         **kw)
                else:
                    out = apply_fastspeech2(p, cfg_pm, ids, lens, **kw)
                return (out["mel_pred"], out["mel_len"],
                        out["log_duration_pred"], out["pitch_pred"])

            fwd_cache[(P, M)] = jax.jit(fwd)
        return fwd_cache[(P, M)]

    per: Dict[int, dict] = {}
    for (P, M), idxs in sorted(groups.items()):
        fwd = get_fwd(P, M)
        for start in range(0, len(idxs), batch_size):
            g = idxs[start : start + batch_size]
            pad = g + [g[0]] * (batch_size - len(g))  # static batch shape
            utts = [ds.load_utterance(i) for i in pad]
            b = collate(utts, vocab, P, M, model_cfg.n_mels)
            spk = b.get("speaker_ids") if multi_speaker else None
            vad = b.get("vad") if use_vad else None
            mel, mel_len, log_dur, pitch_pred = fwd(
                params, b["ids"], b["lens"], b["durs"], b["pitch"], b["energy"],
                b["breath"], b["rough"], b["bright"], b.get("nasal"), spk, vad,
            )
            mel = np.asarray(mel, np.float32)
            mel_len = np.asarray(mel_len)
            pitch_pred = np.asarray(pitch_pred, np.float32)
            # the reference's duration decode (spev_real_metrics.py:215)
            pred_durs = np.round(np.clip(np.exp(np.asarray(log_dur, np.float32)) - 1.0,
                                         0.0, 500.0))
            for row, i in enumerate(g):
                gt = np.asarray(utts[row]["mel"], np.float32)
                L = min(int(mel_len[row]), gt.shape[0])
                tgt_durs = np.asarray(b["durs"][row], np.float32)
                per[i] = {
                    "mcd_db": round(float(mel_cepstral_distortion(
                        mel[row, :L], gt[:L])), 3),
                    "dur_err_pct": round(float(duration_error_pct(
                        pred_durs[row], tgt_durs)), 3),
                    "frames": int(gt.shape[0]),
                }
                if vocoder is not None:
                    if _FX[0] is None:
                        from spev_tpu.config import AudioConfig
                        from spev_tpu.data.dataset import FeatureExtractor

                        _FX[0] = FeatureExtractor(AudioConfig(),
                                                  use_pallas=False)
                    wav = np.asarray(vocoder.infer(mel[row, :L]))
                    mel_v = np.asarray(_FX[0].mel(wav), np.float32).T
                    Lv = min(L, mel_v.shape[0])
                    per[i]["vocoded_mcd_db"] = round(float(
                        mel_cepstral_distortion(mel_v[:Lv], gt[:Lv])), 3)
                # F0 RMSE (Hz): denormalize z-scored log-F0 via the stats;
                # exclude padding and unvoiced-target phonemes (exact 0.0 z)
                if p_stats is not None:
                    tgt_p = np.asarray(b["pitch"][row], np.float32)
                    voiced = (tgt_durs > 0) & (tgt_p != 0.0)
                    if voiced.any():
                        hz_t = np.exp(tgt_p[voiced] * p_stats[1] + p_stats[0])
                        hz_p = np.exp(np.clip(pitch_pred[row][voiced], -2.5, 2.5)
                                      * p_stats[1] + p_stats[0])
                        per[i]["f0_rmse_hz"] = round(float(np.sqrt(
                            np.mean((hz_p - hz_t) ** 2))), 3)

    mcds = [v["mcd_db"] for v in per.values() if np.isfinite(v["mcd_db"])]
    errs = [v["dur_err_pct"] for v in per.values() if np.isfinite(v["dur_err_pct"])]
    f0s = [v["f0_rmse_hz"] for v in per.values()
           if "f0_rmse_hz" in v and np.isfinite(v["f0_rmse_hz"])]
    agg = {
        "n_utterances": len(per),
        "n_skipped": len(skipped),
        "mcd_db_mean": round(statistics.mean(mcds), 3) if mcds else float("nan"),
        "mcd_db_median": round(statistics.median(mcds), 3) if mcds else float("nan"),
        "dur_err_pct_mean": round(statistics.mean(errs), 3) if errs else float("nan"),
        "dur_err_pct_median": round(statistics.median(errs), 3) if errs else float("nan"),
    }
    if f0s:
        agg["f0_rmse_hz_mean"] = round(statistics.mean(f0s), 3)
        agg["f0_rmse_hz_median"] = round(statistics.median(f0s), 3)
    vmcds = [v["vocoded_mcd_db"] for v in per.values()
             if "vocoded_mcd_db" in v and np.isfinite(v["vocoded_mcd_db"])]
    if vmcds:
        agg["vocoded_mcd_db_mean"] = round(statistics.mean(vmcds), 3)
        agg["vocoded_mcd_db_median"] = round(statistics.median(vmcds), 3)
    # the reference's documented targets (PRODUCTION_SYSTEM_SUMMARY.md:227-231)
    agg["meets_mcd_target_6db"] = bool(mcds and agg["mcd_db_mean"] < 6.0)
    agg["meets_dur_err_target_10pct"] = bool(errs and agg["dur_err_pct_mean"] < 10.0)
    if f0s:
        agg["meets_f0_target_20hz"] = bool(agg["f0_rmse_hz_mean"] < 20.0)
    if vmcds:
        agg["meets_vocoded_mcd_target_6db"] = bool(agg["vocoded_mcd_db_mean"] < 6.0)
    return {"per_utterance": per, "aggregate": agg, "skipped": skipped}
