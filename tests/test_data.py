"""Data pipeline: two-pass dataset build on synthetic wavs, duration
rescaling edge cases, bucketed batching, prepper file plumbing."""

import os

import numpy as np
import pytest

from spev_tpu.data.dataset import SpevDataset, _rescale_durations
from spev_tpu.data.batching import BucketBatcher, collate, train_val_split
from spev_tpu.data.downloaders import prep_esd, process_single_speaker
from spev_tpu.text.vocab import Vocab
from spev_tpu.utils.wavio import read_wav, write_wav


def _make_corpus(root, n=4, seconds=0.8):
    rng = np.random.default_rng(0)
    sr = 22050
    os.makedirs(root, exist_ok=True)
    texts = ["hello there", "speech test", "one two", "tiny voice"]
    for i in range(n):
        t = np.arange(int(seconds * sr)) / sr
        f0 = 150 + 30 * i
        y = 0.4 * np.sin(2 * np.pi * f0 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
        y += 0.02 * rng.standard_normal(len(t))
        write_wav(os.path.join(root, f"utt{i}.wav"), y.astype(np.float32), sr)
        with open(os.path.join(root, f"utt{i}.txt"), "w") as f:
            f.write(texts[i % len(texts)])


def test_wavio_roundtrip(tmp_path):
    y = (0.5 * np.sin(np.linspace(0, 100, 22050))).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, y, 22050)
    y2, sr = read_wav(p)
    assert sr == 22050
    np.testing.assert_allclose(y2, y, atol=1e-4)


def test_rescale_durations_reference_semantics():
    # exact-fit
    assert _rescale_durations([2, 2], ["a", "b"], 4) == (["a", "b"], [2, 2])
    # remainder to last phoneme: scale=2.5 → [2, 2], +1 remainder to last
    phs, durs = _rescale_durations([1, 1], ["a", "b"], 5)
    assert durs == [2, 3] and sum(durs) == 5
    # trim from tail, dropping emptied phonemes
    phs, durs = _rescale_durations([5, 1, 1], ["a", "b", "c"], 5)
    assert sum(durs) == 5 and len(phs) == len(durs)
    # zero total bails
    assert _rescale_durations([0, 0], ["a", "b"], 4) is None


@pytest.fixture(scope="module")
def corpus_ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    cache = str(tmp_path_factory.mktemp("cache"))
    _make_corpus(root)
    ds = SpevDataset(root, cache_dir=cache, g2p_backend="rules", stats_sample=4)
    return ds


def test_dataset_build(corpus_ds):
    ds = corpus_ds
    assert len(ds) == 4
    assert {"p_mean", "p_std", "e_mean", "e_std", "c_mean", "c_std"} <= set(ds.stats)
    # serving-side frame-bucket calibration stat: mean frames/phoneme over
    # the corpus, consumed by Synthesizer instead of a hard-coded 10
    assert ds.stats["frames_per_phoneme"] > 0
    # vocab is the sorted union; with espeak-style char tokens the space
    # character sorts before '<PAD>' — same as the reference (SURVEY §2.2)
    assert "<PAD>" in ds.vocab and ds.vocab == sorted(ds.vocab)
    u = ds.load_utterance(0)
    assert u["mel"].shape[1] == 80
    assert int(np.asarray(u["durs"]).sum()) == u["mel"].shape[0]
    assert len(u["phs"]) == len(u["durs"]) == len(u["pitch"])
    # targets respect the clip contract
    assert np.all(u["breath"] >= 0) and np.all(u["breath"] <= 0.8)
    assert np.all(np.abs(u["pitch"]) <= 2.5)
    assert np.all(u["rough"] >= 0) and np.all(u["rough"] <= 1.5)
    assert u["mel"].min() >= -10 and u["mel"].max() <= 2


@pytest.mark.slow
def test_parallel_build_matches_serial(tmp_path):
    """build_workers>1 must write a byte-equivalent cache: same file list,
    stats, vocab, lengths, and per-utterance arrays (workers share the
    parent's stats pass, so normalization is identical)."""
    root = str(tmp_path / "corpus")
    _make_corpus(root)
    ds_par = SpevDataset(root, cache_dir=str(tmp_path / "cache_par"),
                         g2p_backend="rules", stats_sample=4, build_workers=2)
    ds_ser = SpevDataset(root, cache_dir=str(tmp_path / "cache_ser"),
                         g2p_backend="rules", stats_sample=4)
    assert ds_par.files == ds_ser.files
    assert ds_par.vocab == ds_ser.vocab
    assert ds_par.stats == ds_ser.stats
    assert [tuple(l) for l in ds_par.lengths] == [tuple(l) for l in ds_ser.lengths]
    for i in range(len(ds_ser)):
        a, b = ds_ser.load_utterance(i), ds_par.load_utterance(i)
        assert set(a) == set(b)
        for k in a:
            if a[k].dtype == object:
                assert list(a[k]) == list(b[k]), (i, k)
            else:
                np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=f"{i}/{k}")


def test_dataset_cache_reload(corpus_ds, tmp_path):
    ds2 = SpevDataset("unused", cache_dir=corpus_ds.cache_dir)
    assert ds2.files == corpus_ds.files
    assert ds2.vocab == corpus_ds.vocab


def test_empty_cache_is_rebuilt_not_trusted(tmp_path):
    """A metadata.json with files=[] is the footprint of a build that crashed
    mid-extraction (e.g. the device died); loading it must rebuild from the
    corpus, not silently return a 0-utterance dataset."""
    import json

    root = str(tmp_path / "corpus")
    cache = str(tmp_path / "cache")
    _make_corpus(root, n=2)
    os.makedirs(cache)
    with open(os.path.join(cache, "metadata.json"), "w") as f:
        json.dump({"files": [], "stats": {}, "vocab": ["<PAD>"],
                   "speakers": [], "lengths": []}, f)
    ds = SpevDataset(root, cache_dir=cache, g2p_backend="rules", stats_sample=2)
    assert len(ds) == 2


def test_all_files_failing_raises(tmp_path, monkeypatch):
    """If EVERY file errors during feature extraction the cause is systemic
    (dead device, wrong audio config) — the build must raise with the first
    error, never write an empty cache."""
    root = str(tmp_path / "corpus")
    _make_corpus(root, n=2)
    monkeypatch.setattr(
        SpevDataset, "_process_file",
        lambda self, *a, **k: (_ for _ in ()).throw(RuntimeError("device died")),
    )
    with pytest.raises(RuntimeError, match="failed feature extraction"):
        SpevDataset(root, cache_dir=str(tmp_path / "cache"),
                    g2p_backend="rules", stats_sample=2)
    assert not os.path.exists(str(tmp_path / "cache" / "metadata.json"))


def test_all_files_skipped_raises_user_error(tmp_path):
    """Zero usable utterances with zero errors (every wav under min_samples)
    must fail loudly at build time: writing files=[] metadata would trip the
    crash-footprint check and re-extract the corpus on every construction."""
    from spev_tpu.errors import UserError
    from spev_tpu.utils.wavio import write_wav

    root = str(tmp_path / "corpus")
    os.makedirs(root)
    for i in range(2):  # 1000 samples < min_samples=4000
        write_wav(os.path.join(root, f"u{i}.wav"),
                  np.zeros(1000, np.float32), 22050)
        with open(os.path.join(root, f"u{i}.txt"), "w") as f:
            f.write("hi")
    cache = str(tmp_path / "cache")
    with pytest.raises(UserError, match="no usable utterances"):
        SpevDataset(root, cache_dir=cache, g2p_backend="rules", stats_sample=2)
    assert not os.path.exists(os.path.join(cache, "metadata.json"))


def test_bucket_batcher(corpus_ds):
    vocab = Vocab(corpus_ds.vocab)
    b = BucketBatcher(
        corpus_ds, vocab, batch_size=2, phoneme_buckets=(64,), frame_buckets=(128,),
    )
    batches = list(b.epoch(0))
    assert len(batches) == 2
    for batch in batches:
        assert batch["ids"].shape == (2, 64)
        assert batch["mel"].shape == (2, 128, 80)
        assert (batch["mel_lens"] > 0).all()
        # log_durs matches reference formula on valid positions
        valid = batch["durs"] > 0
        np.testing.assert_allclose(
            batch["log_durs"][valid], np.log(batch["durs"][valid] + 1), rtol=1e-6
        )


def test_train_val_split():
    tr, va = train_val_split(100, 0.05, seed=1)
    assert len(va) == 5 and len(tr) == 95 and not set(tr) & set(va)


def test_process_single_speaker_lj_layout(tmp_path):
    lj = tmp_path / "LJSpeech-1.1"
    (lj / "wavs").mkdir(parents=True)
    y = (0.3 * np.sin(np.linspace(0, 200, 8000))).astype(np.float32)
    write_wav(str(lj / "wavs" / "LJ001-0001.wav"), y, 22050)
    (lj / "metadata.csv").write_text("LJ001-0001|raw text|normalized text\n")
    out = tmp_path / "pairs"
    n = process_single_speaker(str(lj), str(out))
    assert n == 1
    assert (out / "LJ001-0001.wav").exists()
    assert (out / "LJ001-0001.txt").read_text() == "normalized text"


def test_prep_esd_layout(tmp_path):
    esd = tmp_path / "esd"
    spk = esd / "0001"
    (spk / "Angry").mkdir(parents=True)
    y = (0.2 * np.sin(np.linspace(0, 50, 4000))).astype(np.float32)
    write_wav(str(spk / "Angry" / "0001_000351.wav"), y, 22050)
    (spk / "0001.txt").write_text("0001_000351\tSome angry words\tAngry\n")
    out = tmp_path / "pairs"
    n = prep_esd(str(esd), str(out))
    assert n == 1
    assert (out / "0001_000351_angry.wav").exists()
    assert (out / "0001_000351_angry.txt").read_text() == "Some angry words"


def test_metadata_lengths_skip_loads(corpus_ds):
    """The cache metadata carries per-utterance (n_phonemes, n_frames) so
    BucketBatcher can bucket without loading every npz; keys must be
    identical to the load-based fallback path (old caches)."""
    assert corpus_ds.lengths is not None and len(corpus_ds.lengths) == len(corpus_ds)
    for i in range(len(corpus_ds)):
        u = corpus_ds.load_utterance(i)
        assert tuple(corpus_ds.lengths[i]) == (len(u["phs"]), int(u["mel"].shape[0]))

    ds2 = SpevDataset("unused", cache_dir=corpus_ds.cache_dir)
    assert [tuple(l) for l in ds2.lengths] == [tuple(l) for l in corpus_ds.lengths]
    vocab = Vocab(corpus_ds.vocab)
    kw = dict(batch_size=2, phoneme_buckets=(64,), frame_buckets=(128,))
    fast = BucketBatcher(ds2, vocab, **kw)
    ds2.lengths = None  # old-cache path: forced to load
    slow = BucketBatcher(ds2, vocab, **kw)
    assert fast._keys == slow._keys
    for a, b in zip(fast.epoch(3), slow.epoch(3)):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_prefetch_preserves_order_and_errors():
    from spev_tpu.data.prefetch import prefetch

    assert list(prefetch(iter(range(100)), depth=3)) == list(range(100))
    assert list(prefetch(iter([]), depth=2)) == []
    # depth<=0 disables (plain iterator back)
    assert list(prefetch(iter([1, 2]), depth=0)) == [1, 2]

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        list(it)
