"""HTTP serving endpoint: health check, synthesis request, error paths."""

import json
import threading
import urllib.request
import urllib.error
import wave
import io

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from http.server import ThreadingHTTPServer

from spev_tpu.cli.serve import make_handler, _wav_bytes
from spev_tpu.config import ModelConfig
from spev_tpu.infer.synthesis import Synthesizer
from spev_tpu.models.fastspeech2 import init_fastspeech2
from spev_tpu.text.vocab import Vocab
from spev_tpu.train.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    vocab = Vocab.build([chr(c) for c in range(ord("a"), ord("p"))] + [" "])
    cfg = ModelConfig(vocab_size=len(vocab), embed_dim=32, hidden_dim=32, n_mels=80)
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    params["duration_predictor"]["output_norm"]["bias"] = jnp.asarray([1.2])
    path = str(tmp_path_factory.mktemp("srv") / "m.spev")
    save_checkpoint(path, params, vocab=vocab.symbols, stats={})
    synth = Synthesizer(path, hifigan_dir=None, model_cfg=cfg, g2p_backend="rules",
                        phoneme_buckets=(64,), frame_buckets=(256,))
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(synth, threading.Lock()))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz") as r:
        data = json.loads(r.read())
    assert data["status"] == "ok" and data["vocoder"] == "griffin-lim"


def test_synthesize_returns_wav(server):
    req = urllib.request.Request(
        server + "/synthesize",
        data=json.dumps({"text": "hello", "emotion": "excited"}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        body = r.read()
    with wave.open(io.BytesIO(body)) as w:
        assert w.getframerate() == 22050
        assert w.getnframes() > 0


def test_synthesize_stream_returns_streaming_wav(server):
    """The streaming endpoint sends a streaming-size RIFF header followed
    by PCM for every clause; total sample count matches clause synthesis."""
    req = urllib.request.Request(
        server + "/synthesize_stream",
        data=json.dumps({"text": "hello there, good day. another clause here."}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        assert r.headers.get("Content-Length") is None  # open-ended stream
        body = r.read()
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    assert body[4:8] == b"\xff\xff\xff\xff"  # streaming-size convention
    pcm = np.frombuffer(body[44:], dtype="<i2")
    assert pcm.size > 0 and np.isfinite(pcm.astype(np.float32)).all()


def test_synthesize_advanced_fields(server):
    """Advanced fields (age, VAD, word_emphasis) route through the
    spev_advanced engine and still return a playable WAV."""
    req = urllib.request.Request(
        server + "/synthesize",
        data=json.dumps({
            "text": "hello friend", "age": 60, "valence": 0.5,
            "lung_capacity": 0.7, "word_emphasis": "1.0,1.5",
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        body = r.read()
    with wave.open(io.BytesIO(body)) as w:
        assert w.getnframes() > 0


def test_stream_error_truncates_not_corrupts(server, monkeypatch):
    """A synthesis failure after the stream header is on the wire must
    truncate the stream — never append an HTTP error body as PCM."""
    import spev_tpu.infer.streaming as streaming_mod

    def boom_stream(synth, text, **kw):
        yield np.zeros(256, np.float32)
        raise RuntimeError("mid-stream failure")

    monkeypatch.setattr(streaming_mod, "stream_text", boom_stream)
    req = urllib.request.Request(
        server + "/synthesize_stream",
        data=json.dumps({"text": "will fail mid stream"}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        body = r.read()  # short read: connection closed by the server
    assert body[:4] == b"RIFF"
    assert b"HTTP/1.0 500" not in body and b"error" not in body
    assert len(body) == 44 + 256 * 2  # header + exactly one clause of PCM


def test_concurrent_streams_interleave(server, monkeypatch):
    """Two simultaneous /synthesize_stream clients make interleaved progress
    (VERDICT r2 #5).  Stream A yields one clause, then BLOCKS until stream B
    has fully delivered to its client.  Under the old global stream lock B
    could not start until A's generator was exhausted, so A's wait would time
    out and truncate A's stream; lock-free per-stream execution interleaves."""
    import time

    import spev_tpu.infer.streaming as streaming_mod

    b_done = threading.Event()
    chunk = np.full(256, 0.25, np.float32)

    def fake_stream(synth, text, **kw):
        if "SLOW" in text:
            yield chunk
            if not b_done.wait(timeout=60):
                raise RuntimeError("stream B made no progress while A streamed")
            yield chunk
        else:
            yield chunk

    monkeypatch.setattr(streaming_mod, "stream_text", fake_stream)

    bodies = {}

    def client(name, text):
        req = urllib.request.Request(
            server + "/synthesize_stream",
            data=json.dumps({"text": text}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            bodies[name] = r.read()
        if name == "B":
            b_done.set()

    ta = threading.Thread(target=client, args=("A", "SLOW first stream"))
    tb = threading.Thread(target=client, args=("B", "fast second stream"))
    ta.start()
    time.sleep(0.3)  # A is mid-stream (first clause on the wire) before B arrives
    tb.start()
    ta.join(timeout=120)
    tb.join(timeout=120)
    assert len(bodies["B"]) == 44 + 256 * 2  # B completed while A was open
    assert len(bodies["A"]) == 44 + 2 * 256 * 2  # both clauses: A saw B's progress


def test_stream_rejects_advanced_fields(server):
    req = urllib.request.Request(
        server + "/synthesize_stream",
        data=json.dumps({"text": "hi", "age": 70}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_missing_text_is_400(server):
    req = urllib.request.Request(server + "/synthesize", data=b"{}",
                                 headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server + "/nope")
    assert e.value.code == 404


def test_coalescing_batcher_matches_solo(tmp_path):
    """Concurrent submits coalesce into one batch; each result must equal
    a solo synthesis with the same controls."""
    from spev_tpu.infer.batching import CoalescingBatcher
    from spev_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator, init_hifigan
    from spev_tpu.infer.vocoder import Vocoder

    vocab = Vocab.build([chr(c) for c in range(ord("a"), ord("p"))] + [" "])
    cfg = ModelConfig(vocab_size=len(vocab), embed_dim=32, hidden_dim=32, n_mels=8)
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    params["duration_predictor"]["output_norm"]["bias"] = jnp.asarray([1.2])
    path = str(tmp_path / "m.spev")
    save_checkpoint(path, params, vocab=vocab.symbols, stats={})
    vcfg = HiFiGANConfig(
        resblock="2", upsample_rates=(8, 8, 4), upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), num_mels=8,
    )
    synth = Synthesizer(path, hifigan_dir=None, model_cfg=cfg, g2p_backend="rules",
                        phoneme_buckets=(64,), frame_buckets=(128, 256))
    synth.vocoder = Vocoder(generator=HiFiGANGenerator(
        vcfg, init_hifigan(jax.random.PRNGKey(1), vcfg)))

    batcher = CoalescingBatcher(synth, max_batch=4, window_ms=200.0)
    reqs = [("hello there", {"pitch_scale": 1.0}),
            ("good day friend", {"pitch_scale": 1.4, "breathiness": 0.4}),
            ("bye now", {"duration_scale": 1.5})]
    out = [None] * len(reqs)

    def worker(i):
        out[i] = batcher.submit(reqs[i][0], **reqs[i][1])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(reqs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    for i, (text, kw) in enumerate(reqs):
        assert out[i] is not None
        solo = synth.synthesize_many([text], batch_size=1, **{
            k: np.asarray([v], np.float32) if k.endswith("_scale") or k in
            ("breathiness", "roughness", "brightness") else v
            for k, v in kw.items()})
        # batch-of-3 vs batch-of-1 are different XLA compilations: float
        # reduction order differs, ~1e-4 drift over 8 FFT blocks is the
        # expected envelope (exactness across FRAME buckets at equal batch
        # size is asserted in test_synthesize_many_adaptive_buckets)
        np.testing.assert_allclose(out[i][1], solo[0][1], atol=5e-4)


def test_unknown_emotion_is_400(server):
    """A typo'd emotion must 400 with the valid choices, not silently fall
    back to neutral knobs (found by live-driving the HTTP surface)."""
    import json as _json

    req = urllib.request.Request(
        server + "/synthesize",
        data=_json.dumps({"text": "x", "emotion": "joyful-typo"}).encode(),
        headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    assert "unknown emotion" in e.value.read().decode()


def test_response_cache_serves_identical_bytes_and_counts_hits(server, tmp_path_factory):
    """With --response_cache, a repeated /synthesize request returns the
    cached body (bit-identical) and /healthz reports the hit; a different
    request is a miss.  Uses its own server so the cache starts empty."""
    vocab = Vocab.build([chr(c) for c in range(ord("a"), ord("p"))] + [" "])
    cfg = ModelConfig(vocab_size=len(vocab), embed_dim=32, hidden_dim=32, n_mels=80)
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    params["duration_predictor"]["output_norm"]["bias"] = jnp.asarray([1.2])
    path = str(tmp_path_factory.mktemp("srvc") / "m.spev")
    save_checkpoint(path, params, vocab=vocab.symbols, stats={})
    synth = Synthesizer(path, hifigan_dir=None, model_cfg=cfg, g2p_backend="rules",
                        phoneme_buckets=(64,), frame_buckets=(256,))
    srv = ThreadingHTTPServer(("127.0.0.1", 0),
                              make_handler(synth, response_cache=8))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        def post(payload):
            req = urllib.request.Request(
                base + "/synthesize", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                return r.read()

        b1 = post({"text": "hello", "pitch_scale": 1.1})
        b2 = post({"text": "hello", "pitch_scale": 1.1})
        assert b1 == b2  # served from cache, bit-identical
        b3 = post({"text": "hello hello hello", "pitch_scale": 1.1})
        assert b3 != b1  # different text -> different entry
        with urllib.request.urlopen(base + "/healthz") as r:
            health = json.loads(r.read())
        rc = health["response_cache"]
        assert rc == {"size": 2, "max": 8, "hits": 1, "misses": 2}
    finally:
        srv.shutdown()


def test_concurrency_soak_mixed_requests(tmp_path_factory):
    """Serving soak (VERDICT r3 #9): N threads firing a MIX of request
    kinds — plain /synthesize, /synthesize_stream, and repeated texts that
    hit the LRU response cache — against one server.  Every response must
    be a valid 200 WAV, and identical (text, controls) must return
    byte-identical audio whether served fresh, coalesced, or cached."""
    vocab = Vocab.build([chr(c) for c in range(ord("a"), ord("p"))] + [" "])
    cfg = ModelConfig(vocab_size=len(vocab), embed_dim=32, hidden_dim=32, n_mels=80)
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    params["duration_predictor"]["output_norm"]["bias"] = jnp.asarray([1.2])
    path = str(tmp_path_factory.mktemp("soak") / "m.spev")
    save_checkpoint(path, params, vocab=vocab.symbols, stats={})
    synth = Synthesizer(path, hifigan_dir=None, model_cfg=cfg, g2p_backend="rules",
                        phoneme_buckets=(64,), frame_buckets=(256,))
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(synth, threading.Lock(), response_cache=16))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    texts = ["alpha one", "bravo two", "charlie three", "delta four"]
    N = 24
    results: list = [None] * N
    errors: list = []

    def post(i):
        kind = i % 3
        text = texts[i % len(texts)]
        try:
            if kind == 2:
                req = urllib.request.Request(
                    base + "/synthesize_stream",
                    data=json.dumps({"text": text}).encode(),
                    headers={"Content-Type": "application/json"})
            else:
                req = urllib.request.Request(
                    base + "/synthesize",
                    data=json.dumps({"text": text, "pitch_scale": 1.0}).encode(),
                    headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                assert r.status == 200
                results[i] = (kind, text, r.read())
        except Exception as e:  # surface in the main thread
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=post, args=(i,)) for i in range(N)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    srv.shutdown()
    assert not errors, errors
    by_key: dict = {}
    for kind, text, body in results:
        # every body is a parseable non-empty WAV
        with wave.open(io.BytesIO(body)) as w:
            assert w.getnframes() > 0
            assert w.getnchannels() == 1
        # identical non-stream requests must serve identical bytes
        # (fresh vs cache-hit must be indistinguishable)
        if kind != 2:
            by_key.setdefault(text, body)
            assert by_key[text] == body
    assert len(by_key) == len(texts)
