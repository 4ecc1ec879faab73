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


@pytest.fixture
def espeak_g2p():
    """Install a fake ``phonemizer`` in sys.modules and reload the g2p
    module so the espeak branch — the reference's primary frontend
    (``spev_real_metrics.py:753``) — executes in CI without espeak-ng."""
    import importlib
    import sys
    import types

    import spev_tpu.text.g2p as g2p_mod

    ipa = {"hello world": "həloʊ wɜːld", "hello": "həloʊ", "world": "wɜːld"}
    calls = []

    def fake_phonemize(text, language=None, backend=None, strip=None, **kw):
        calls.append((text, language, backend, strip))
        return ipa.get(text, "aɪ")

    fake = types.ModuleType("phonemizer")
    fake.phonemize = fake_phonemize
    had = sys.modules.get("phonemizer")
    sys.modules["phonemizer"] = fake
    importlib.reload(g2p_mod)
    assert g2p_mod._HAS_ESPEAK  # the import guard took the espeak path
    try:
        yield g2p_mod, calls
    finally:
        if had is None:
            del sys.modules["phonemizer"]
        else:
            sys.modules["phonemizer"] = had
        importlib.reload(g2p_mod)


def test_espeak_backend_reference_tokenization(espeak_g2p):
    """The espeak path must match the reference exactly: phonemize() called
    with (language='en-us', backend='espeak', strip=True), the IPA *string*
    split into single characters (spaces included), wrapped in <SIL>."""
    g2p_mod, calls = espeak_g2p
    g = g2p_mod.G2P(backend="auto")  # auto prefers espeak when importable
    assert g.backend == "espeak"
    toks = g.phonemes("hello world")
    assert toks == [SIL] + list("həloʊ wɜːld") + [SIL]
    assert " " in toks  # the inter-word space is a real token
    assert calls[-1] == ("hello world", "en-us", "espeak", True)
    # per-word splitting (emphasis mapping) phonemizes each word alone
    per_word = g.phonemes_per_word("hello world")
    assert per_word == [list("həloʊ"), list("wɜːld")]


def test_espeak_vocab_interaction(espeak_g2p):
    """Vocab built from espeak char tokens: the space character sorts before
    '<PAD>' (the reference quirk — index 0 is whatever sorts first), and the
    0-vs-1 OOV fallback asymmetry holds."""
    g2p_mod, _ = espeak_g2p
    toks = g2p_mod.G2P(backend="espeak").phonemes("hello world")
    v = Vocab.build(toks)
    assert v.symbols[0] == " "  # space < '<' in code-point order
    assert v.pad_id == v.symbols.index(PAD) != 0
    # reference inference fallback .get(p, 1) vs dataset .get(p, 0)
    assert v.encode(["ZZZ"], fallback=1)[0] == 1
    assert v.encode(["ZZZ"], fallback=0)[0] == 0


def test_espeak_through_synthesizer(espeak_g2p, tmp_path):
    """End-to-end: a Synthesizer constructed with g2p_backend='espeak'
    tokenizes through the mocked phonemizer and produces audio."""
    import jax
    import jax.numpy as jnp

    from spev_tpu.config import ModelConfig
    from spev_tpu.infer.synthesis import Synthesizer
    from spev_tpu.models.fastspeech2 import init_fastspeech2
    from spev_tpu.train.checkpoint import save_checkpoint

    g2p_mod, calls = espeak_g2p
    vocab = Vocab.build(list("həloʊ wɜːld"))
    cfg = ModelConfig(vocab_size=len(vocab), embed_dim=32, hidden_dim=32, n_mels=80)
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    params["duration_predictor"]["output_norm"]["bias"] = jnp.asarray([1.2])
    path = str(tmp_path / "m.spev")
    save_checkpoint(path, params, vocab=vocab.symbols, stats={})
    synth = Synthesizer(path, hifigan_dir=None, model_cfg=cfg,
                        g2p_backend="espeak",
                        phoneme_buckets=(64,), frame_buckets=(256,))
    wav, mel = synth.synthesize("hello world")
    assert ("hello world", "en-us", "espeak", True) in calls
    assert np.isfinite(wav).all() and mel.shape[0] >= 1


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


def test_g2p_rule_fallback_fuzz_never_crashes():
    """G2P fuzz (VERDICT r3 #9): the rule fallback must survive arbitrary
    input — unicode, digits, punctuation soup, emoji, very long tokens,
    control characters — never raising and always yielding at least one
    token (the <SIL> wrap guarantees a non-empty sequence)."""
    import random
    import string

    from spev_tpu.text.g2p import G2P

    g = G2P("rules")
    pools = [
        string.ascii_letters, string.digits, string.punctuation,
        "äöüßéèñçøπλΩ漢字カナ한글", "👍🔥🎉", "\t\n\r\x0b",
        " '’“”—–…",
    ]
    rng = random.Random(0)
    cases = ["", " ", "''", "‒—", "🎉🎉🎉", "x" * 500, "9" * 40,
             "\n\n\n", "mc'duff's 9th", "ÆTHER œuvre"]
    for _ in range(200):
        n = rng.randrange(0, 60)
        cases.append("".join(rng.choice(rng.choice(pools)) for _ in range(n)))
    for text in cases:
        phones = g.phonemes(text)
        assert len(phones) >= 1, repr(text)
        assert all(isinstance(p, str) and p for p in phones), repr(text)
