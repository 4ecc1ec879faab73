"""Reference training-cache interop (SURVEY §2.9 proper_cache_strict gap).

Builds a cache in the reference's exact on-disk format — per-utterance
torch pickles with phs/durs/mel/pitch/energy/breath/rough/bright and a
metadata.json (spev_real_metrics.py:419-430) — imports it with
cache_import, and verifies the result both numerically and end-to-end
(SpevDataset → BucketBatcher → one train step).  Also covers the
monolithic proper_cache_strict.pt layout.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from spev_tpu.data.cache_import import import_monolithic_cache, import_reference_cache

NMEL = 8


def _ref_utt(rng, n_ph=6):
    durs = rng.integers(1, 5, size=n_ph).tolist()
    T = int(sum(durs))
    return {
        "phs": ["<SIL>"] + [chr(97 + i) for i in range(n_ph - 2)] + ["<SIL>"],
        "durs": durs,
        "mel": torch.from_numpy(
            np.clip(rng.standard_normal((T, NMEL)) - 4, -10, 2).astype(np.float32)
        ),
        "pitch": rng.standard_normal(n_ph).astype(np.float32),
        "energy": rng.standard_normal(n_ph).astype(np.float32),
        "breath": rng.uniform(0, 0.8, n_ph).astype(np.float32),
        "rough": rng.uniform(0, 1.5, n_ph).astype(np.float32),
        "bright": rng.standard_normal(n_ph).astype(np.float32),
    }


@pytest.fixture
def ref_cache(tmp_path):
    rng = np.random.default_rng(0)
    cache = tmp_path / "cache_stable"
    cache.mkdir()
    files, vocab = [], {"<PAD>", "<UNK>", "<SIL>"}
    utts = []
    for i in range(5):
        u = _ref_utt(rng)
        utts.append(u)
        p = str(cache / f"u_{i:05d}.pt")
        torch.save(u, p)
        files.append(p)
        vocab.update(u["phs"])
    stats = {"p_mean": 4.7, "p_std": 0.3, "e_mean": -3.1, "e_std": 1.1,
             "c_mean": 7.5, "c_std": 0.4}
    with open(cache / "metadata.json", "w") as f:
        json.dump({"files": files, "stats": stats, "vocab": sorted(vocab)}, f)
    return str(cache), utts, stats


def test_import_reference_cache_numerics(ref_cache, tmp_path):
    src, utts, stats = ref_cache
    out = str(tmp_path / "cache_spev")
    meta = import_reference_cache(src, out)
    assert len(meta["files"]) == 5
    assert meta["stats"] == stats
    u0 = np.load(os.path.join(out, meta["files"][0]), allow_pickle=True)
    np.testing.assert_allclose(u0["mel"], utts[0]["mel"].numpy(), atol=0)
    np.testing.assert_allclose(u0["pitch"], utts[0]["pitch"], atol=0)
    assert [str(p) for p in u0["phs"]] == utts[0]["phs"]
    np.testing.assert_array_equal(u0["durs"], utts[0]["durs"])


@pytest.mark.slow
def test_imported_cache_trains_end_to_end(ref_cache, tmp_path):
    import jax
    from spev_tpu.config import ModelConfig, SpevConfig, TrainConfig
    from spev_tpu.data.batching import BucketBatcher
    from spev_tpu.data.dataset import SpevDataset
    from spev_tpu.parallel.mesh import make_mesh, shard_batch
    from spev_tpu.text.vocab import Vocab
    from spev_tpu.train.trainer import init_train_state, make_train_step

    src, _, _ = ref_cache
    out = str(tmp_path / "cache_spev")
    import_reference_cache(src, out)

    ds = SpevDataset("/nonexistent-unused", cache_dir=out)  # loads metadata only
    vocab = Vocab(ds.vocab)
    batcher = BucketBatcher(ds, vocab, batch_size=5, phoneme_buckets=(16,),
                            frame_buckets=(64,), n_mels=NMEL)
    batch = next(iter(batcher.epoch(0)))
    assert batch["ids"].shape == (5, 16)

    cfg = SpevConfig(
        model=ModelConfig(vocab_size=len(vocab), embed_dim=16, hidden_dim=16,
                          n_mels=NMEL, max_phonemes=16, max_frames=64),
        train=TrainConfig(batch_size=5, warmup_steps=10),
    )
    mesh = make_mesh((1,), ("data",))
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, mesh, state.params, use_dropout=False,
                           batch_keys=tuple(sorted(batch)))
    state, metrics = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_import_monolithic_cache(ref_cache, tmp_path):
    _, utts, _ = ref_cache
    mono = str(tmp_path / "proper_cache_strict.pt")
    torch.save({"utterances": utts, "stats": {"p_mean": 0.0},
                "vocab": sorted({p for u in utts for p in u["phs"]} | {"<PAD>", "<UNK>"})},
               mono)
    out = str(tmp_path / "cache_mono")
    meta = import_monolithic_cache(mono, out)
    assert len(meta["files"]) == 5
    u0 = np.load(os.path.join(out, meta["files"][0]), allow_pickle=True)
    np.testing.assert_allclose(u0["mel"], utts[0]["mel"].numpy(), atol=0)


def test_import_monolithic_rejects_garbage(tmp_path):
    bad = str(tmp_path / "bad.pt")
    torch.save({"something": 1}, bad)
    with pytest.raises(ValueError, match="unrecognized monolithic cache layout"):
        import_monolithic_cache(bad, str(tmp_path / "o"))


def test_monolithic_alias_keys_and_loud_empty(tmp_path):
    """The monolithic proper_cache_strict.pt belongs to the reference's
    ABSENT module, so long-form keys (phonemes/durations) must import too
    (found by use: they were silently rejected -> 0-file cache); and a
    cache where EVERY entry is rejected must raise, not write an empty
    metadata.json."""
    import torch

    from spev_tpu.data.cache_import import import_monolithic_cache
    from spev_tpu.errors import UserError

    def utt(n_ph=6, T=18):
        return {
            "phonemes": [chr(ord("a") + j) for j in range(n_ph)],
            "durations": torch.full((n_ph,), T // n_ph, dtype=torch.float32),
            "mel": torch.randn(T, 8).clamp(-10, 2),
            "pitch": torch.randn(n_ph), "energy": torch.randn(n_ph),
            "breath": torch.rand(n_ph), "rough": torch.rand(n_ph),
            "bright": torch.randn(n_ph),
        }

    path = str(tmp_path / "mono.pt")
    torch.save({"utterances": [utt(), utt()], "stats": {}}, path)
    meta = import_monolithic_cache(path, str(tmp_path / "out"))
    assert len(meta["files"]) == 2
    assert "a" in meta["vocab"] and "<SIL>" in meta["vocab"]

    bad = str(tmp_path / "bad.pt")
    torch.save({"utterances": [{"mel": torch.randn(4, 8)}]}, bad)
    with pytest.raises(UserError, match="every one of the 1"):
        import_monolithic_cache(bad, str(tmp_path / "out2"))


def test_convert_cache_rejects_native_cache_cleanly(tmp_path):
    """spev-convert cache on an already-native npz cache must give a clear
    UserError, not a torch-zip traceback (found by use)."""
    import json as _json

    from spev_tpu.data.cache_import import import_reference_cache
    from spev_tpu.errors import UserError

    src = tmp_path / "native"
    src.mkdir()
    (src / "u_00000.npz").write_bytes(b"not really npz")
    with open(src / "metadata.json", "w") as f:
        _json.dump({"files": ["u_00000.npz"], "stats": {}, "vocab": []}, f)
    with pytest.raises(UserError, match="already a spev_tpu npz cache"):
        import_reference_cache(str(src), str(tmp_path / "out"))
