"""Text frontend: vocab conventions, G2P backends, TextGrid parsing,
word-emphasis mapping."""

import numpy as np
import pytest

from spev_tpu.text.vocab import Vocab, pad_to_bucket, pick_bucket, PAD, SIL, UNK
from spev_tpu.text.g2p import G2P, CMUDict, rules_phonemize
from spev_tpu.text.textgrid import parse_textgrid, phone_intervals, intervals_to_durations
from spev_tpu.text.emphasis import parse_emphasis, word_emphasis_to_phonemes


def test_vocab_reference_conventions():
    v = Vocab.build(["a", "b", "ʃ"])
    # sorted union: '<' sorts before letters → <PAD> is index 0 (padding_idx)
    assert v.symbols[0] == PAD
    assert v.pad_id == 0
    assert set([PAD, UNK, SIL]).issubset(set(v.symbols))
    ids = v.encode(["a", "zzz"], fallback=1)
    assert ids[1] == 1  # inference fallback
    ids0 = v.encode(["zzz"], fallback=0)
    assert ids0[0] == 0  # dataset fallback


def test_pad_and_buckets():
    ids = np.array([3, 4, 5], np.int32)
    out = pad_to_bucket(ids, 8)
    assert out.shape == (8,) and out[3:].sum() == 0
    assert pick_bucket(100, (64, 128, 256)) == 128
    with pytest.raises(ValueError):
        pick_bucket(300, (64, 128, 256))


def test_rules_g2p_deterministic_and_silence_wrapped():
    g = G2P(backend="rules")
    toks = g.phonemes("Hello world")
    assert toks[0] == SIL and toks[-1] == SIL
    assert toks == g.phonemes("Hello world")
    assert len(toks) > 4
    # digraphs map to IPA
    assert "ʃ" in "".join(g.phonemes("shoe"))
    assert "θ" in "".join(g.phonemes("think"))
    # numbers normalized to words
    assert len(g.phonemes("42")) > 3


def test_cmudict_backend(tmp_path):
    d = tmp_path / "cmudict.dict"
    d.write_text("hello HH AH0 L OW1\nworld W ER1 L D\nhello(2) HH EH0 L OW1\n")
    g = G2P(backend="cmudict", cmudict_path=str(d))
    toks = g.phonemes("hello world")
    assert toks == [SIL, "HH", "AH0", "L", "OW1", "W", "ER1", "L", "D", SIL]
    # OOV → <SIL> (documented reference behavior)
    assert g.phonemes("qqq") == [SIL, SIL, SIL]


LONG_TG = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.0
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = 1.0
            text = "hi"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 0.25
            text = "HH"
        intervals [2]:
            xmin = 0.25
            xmax = 0.75
            text = "AY1"
        intervals [3]:
            xmin = 0.75
            xmax = 1.0
            text = ""
"""


def test_textgrid_long_form(tmp_path):
    p = tmp_path / "a.TextGrid"
    p.write_text(LONG_TG)
    tiers = parse_textgrid(str(p))
    assert [t.name for t in tiers] == ["words", "phones"]
    ivs = phone_intervals(str(p))
    assert [i.mark for i in ivs] == ["HH", "AY1", ""]
    phs, durs = intervals_to_durations(ivs)
    # frames = int(dt * 22050/256): 0.25s → 21, 0.5s → 43, 0.25s → 21
    assert phs == ["HH", "AY1", "<SIL>"]
    assert durs == [int(0.25 * 22050 / 256), int(0.5 * 22050 / 256), int(0.25 * 22050 / 256)]


def test_emphasis_mapping():
    scales = parse_emphasis("1.0,1.5,0.8")
    ph_per_word = [["h", "ə"], ["w", "ɜː", "l", "d"], ["x"]]
    vec = word_emphasis_to_phonemes(scales, ph_per_word)
    assert vec.shape == (1 + 2 + 4 + 1 + 1,)
    np.testing.assert_allclose(vec, [1.0, 1.0, 1.0, 1.5, 1.5, 1.5, 1.5, 0.8, 1.0])
    # fewer scales than words: tail defaults to 1.0
    vec2 = word_emphasis_to_phonemes([2.0], ph_per_word)
    assert vec2[1] == 2.0 and vec2[3] == 1.0
