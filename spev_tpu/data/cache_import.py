"""Import the reference's preprocessed training cache.

The reference dataset writes per-utterance torch pickles ``u_{i:05d}.pt``
(keys ``phs/durs/mel/pitch/energy/breath/rough/bright``; mel stored
``(T, n_mels)``) plus ``metadata.json`` with ``files/stats/vocab``
(``/root/reference/spev_real_metrics.py:419-430``).  The documented
``spev_tts`` surface additionally mentions a monolithic
``proper_cache_strict.pt`` (README.md:158, QUICKSTART.sh:208-221) whose
format is unspecified — the module is absent from the reference source —
so the monolithic importer accepts the plausible layouts (a list of
utterance dicts, or a dict with an ``utterances``/``files`` list) on a
best-effort basis.

Converting a cache means a reference user's hours of librosa/pyin/MFA
preprocessing carry over to this framework without rerunning anything:

    python -m spev_tpu.cli.convert cache cache_stable/ cache_spev/
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional

import numpy as np

from spev_tpu.utils.torch_loader import load_checkpoint
from spev_tpu.errors import UserError

_FEATURE_KEYS = ("pitch", "energy", "breath", "rough", "bright")


_KEY_ALIASES = {
    # the monolithic proper_cache_strict.pt belongs to the reference's
    # ABSENT spev_tts.py, so its exact field names are unknowable; accept
    # the surviving engine's names plus their obvious long forms
    "phs": ("phs", "phonemes"),
    "durs": ("durs", "durations"),
}


def _get(u: dict, key: str):
    for k in _KEY_ALIASES.get(key, (key,)):
        if k in u:
            return u[k]
    raise KeyError(key)


def _write_utterance(out_dir: str, name: str, u: dict) -> Optional[str]:
    """One reference cache entry → one spev npz entry (same field layout
    as spev_tpu.data.dataset._process_file)."""
    try:
        phs = [str(p) for p in _get(u, "phs")]
        durs = np.asarray(_get(u, "durs"), np.int32)
        mel = np.asarray(u["mel"], np.float32)  # (T, n_mels) both sides
        if mel.ndim != 2 or len(phs) != len(durs) or int(durs.sum()) != mel.shape[0]:
            return None
        data = {
            "phs": np.asarray(phs, dtype=object),
            "durs": durs,
            "mel": mel,
        }
        for k in _FEATURE_KEYS:
            v = np.asarray(u[k], np.float32)
            if v.shape != (len(phs),):
                return None
            data[k] = v
        path = os.path.join(out_dir, f"{name}.npz")
        np.savez(path, **data)
        return path
    except (KeyError, ValueError, TypeError):
        return None


def import_reference_cache(ref_cache_dir: str, out_cache_dir: str) -> dict:
    """Reference ``cache_stable``-style directory → spev npz cache dir.

    Returns the written metadata dict (files/stats/vocab/speakers)."""
    meta_path = os.path.join(ref_cache_dir, "metadata.json")
    with open(meta_path) as f:
        ref_meta = json.load(f)

    listed = ref_meta.get("files") or sorted(
        glob.glob(os.path.join(ref_cache_dir, "u_*.pt"))
    )
    # converting a cache that is ALREADY in this framework's npz format
    # must fail with a clear message, not a torch-zip reader traceback
    # (found by use: spev-convert cache <spev cache> crashed inside the
    # torch loader on the first .npz)
    if any(str(e).endswith(".npz") for e in listed):
        raise UserError(
            f"{ref_cache_dir} is already a spev_tpu npz cache — nothing to "
            "convert; point training at it directly (its metadata.json is "
            "the native format)"
        )
    os.makedirs(out_cache_dir, exist_ok=True)

    files = []
    for entry in listed:
        src = entry if os.path.exists(entry) else os.path.join(
            ref_cache_dir, os.path.basename(entry)
        )
        if not os.path.exists(src):
            continue
        u = load_checkpoint(src)
        name = os.path.splitext(os.path.basename(src))[0]
        path = _write_utterance(out_cache_dir, name, u)
        if path:
            files.append(os.path.basename(path))

    meta = {
        "files": files,
        "stats": dict(ref_meta["stats"]),
        "vocab": list(ref_meta["vocab"]),
        "speakers": [],
    }
    with open(os.path.join(out_cache_dir, "metadata.json"), "w") as f:
        json.dump(meta, f)
    return meta


def import_monolithic_cache(path: str, out_cache_dir: str) -> dict:
    """Best-effort importer for a monolithic ``proper_cache_strict.pt``.

    Accepted layouts (the owning module is absent from the reference, so
    the format is reconstructed): a list of utterance dicts, or a dict
    carrying ``utterances``/``files``/``data`` (list of utterance dicts)
    plus optional ``stats``/``vocab``."""
    obj = load_checkpoint(path)
    utts = None
    stats, vocab = {}, None
    if isinstance(obj, list):
        utts = obj
    elif isinstance(obj, dict):
        for k in ("utterances", "files", "data"):
            if isinstance(obj.get(k), list) and obj[k] and isinstance(obj[k][0], dict):
                utts = obj[k]
                break
        stats = dict(obj.get("stats") or {})
        vocab = obj.get("vocab")
    if utts is None:
        raise UserError(
            f"{path}: unrecognized monolithic cache layout "
            f"({type(obj).__name__}; expected a list of utterance dicts or a "
            "dict with an 'utterances'/'files'/'data' list)"
        )

    os.makedirs(out_cache_dir, exist_ok=True)
    files, vocab_set = [], set()
    for i, u in enumerate(utts):
        p = _write_utterance(out_cache_dir, f"u_{i:05d}", u)
        if p:
            files.append(os.path.basename(p))
            vocab_set.update(str(x) for x in _get(u, "phs"))
    if not files:
        raise UserError(
            f"{path}: recognized the cache layout but every one of the "
            f"{len(utts)} utterance entries was rejected (missing/"
            "inconsistent fields: need phs|phonemes, durs|durations, mel "
            "with sum(durs) == mel frames, and per-phoneme "
            "pitch/energy/breath/rough/bright)"
        )
    if vocab is None:
        vocab = sorted(vocab_set | {"<PAD>", "<UNK>", "<SIL>"})
    meta = {"files": files, "stats": stats, "vocab": list(vocab), "speakers": []}
    with open(os.path.join(out_cache_dir, "metadata.json"), "w") as f:
        json.dump(meta, f)
    return meta
