"""Native C++ I/O runtime: builds with g++, round-trips WAVs bit-compatibly
with the Python reader, trim/normalize matches the Python prep, and the
threaded prefetcher yields every file."""

import os

import numpy as np
import pytest

from spev_tpu.utils import native
from spev_tpu.utils.wavio import read_wav as py_read, write_wav as py_write

pytestmark = pytest.mark.skipif(not native.ensure_built(), reason="g++ unavailable")


def _tone(path, freq=440.0, n=22050, sr=22050, stereo=False):
    t = np.arange(n) / sr
    y = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    py_write(path, y, sr)
    return y


def test_wav_roundtrip_native_vs_python(tmp_path):
    p = str(tmp_path / "a.wav")
    y = _tone(p)
    yn, srn = native.read_wav(p)
    yp, srp = py_read(p)
    assert srn == srp == 22050
    np.testing.assert_array_equal(yn, yp)

    p2 = str(tmp_path / "b.wav")
    native.write_wav(p2, y, 22050)
    y2, _ = py_read(p2)
    np.testing.assert_allclose(y2, y, atol=1e-4)


def test_trim_normalize_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    sil = np.zeros(6000, np.float32)
    speech = (0.4 * rng.standard_normal(22050)).astype(np.float32)
    y = np.concatenate([sil, speech, sil])

    trimmed = native.trim_normalize(y, top_db=25.0, normalize=True)
    from spev_tpu.data.downloaders import _normalize, _trim_silence

    ref = _normalize(_trim_silence(y, top_db=25.0))
    assert trimmed.shape == ref.shape
    np.testing.assert_allclose(trimmed, ref, atol=1e-5)
    assert np.abs(trimmed).max() == pytest.approx(1.0)


def test_prefetcher_yields_all_files(tmp_path):
    paths = []
    for i in range(6):
        p = str(tmp_path / f"f{i}.wav")
        _tone(p, freq=200 + 50 * i, n=4000 + 100 * i)
        paths.append(p)
    paths.append(str(tmp_path / "missing.wav"))

    reader = native.PrefetchingReader(paths, capacity=2)
    seen = {}
    for idx, y, sr in reader:
        seen[idx] = (None if y is None else len(y), sr)
    reader.close()
    assert set(seen) == set(range(7))
    for i in range(6):
        assert seen[i][0] == 4000 + 100 * i and seen[i][1] == 22050
    assert seen[6][0] is None  # missing file reported, not crashed
