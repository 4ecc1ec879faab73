"""HTTP synthesis server — the production serving surface.

A dependency-free (stdlib http.server) endpoint over the compiled
`Synthesizer`:

    python -m spev_tpu.cli.serve --checkpoint best.spev \
        [--hifigan_dir DIR] [--host 127.0.0.1] [--port 8571]

    POST /synthesize   {"text": "...", "breathiness": 0.2, "roughness": 0.0,
                        "brightness": 0.0, "pitch_scale": 1.0,
                        "duration_scale": 1.0, "energy_scale": 1.0,
                        "emotion": "exhausted" (optional, overrides knobs)}
        → audio/wav bytes.  Advanced fields — "nasality", "valence",
        "arousal", "dominance", "age", "lung_capacity", "word_emphasis"
        ("1.0,1.5,..."), "speaker" — route the request through the
        spev_advanced engine (VAD knobs, age pitch formula, physiology,
        emphasis, learned nasality + mel DSP).
    POST /synthesize_stream   same body → audio/wav with streaming-size
        header (RIFF sizes 0xFFFFFFFF), PCM flushed clause-by-clause as
        each segment is synthesized (time-to-first-audio ≈ one clause
        instead of the full utterance); connection close ends the stream
    GET  /healthz      → {"status": "ok", "vocoder": "hifigan"|"griffin-lim",
                          "response_cache": {size, max, hits, misses}}

Identical /synthesize requests (same text + controls) are served from an
LRU response cache without touching the device (``--response_cache``,
default 256 entries; synthesis is deterministic so the cached wav is
bit-identical). Streaming requests are never cached.

Graphs are compiled on first request per bucket and cached (use the
persistent compilation cache to make cold starts fast across restarts).
Concurrent /synthesize requests are coalesced into one device batch
(`infer/batching.CoalescingBatcher`, ``--max_batch``/``--batch_window_ms``;
per-request controls ride the same graph) — the fused serving graph is
~5× more efficient at batch 16 than at batch 1.

Concurrency model: the Synthesizer's graph caches are internally locked
(one compiled callable per bucket, no duplicate compilation), and JAX
dispatch is thread-safe with the device executing enqueued graphs in
order — so streaming and advanced requests run concurrently from their
handler threads with clause/request granularity interleaving, while the
batcher worker owns the batched /synthesize graph.  No handler-level
compute lock: one slow streaming client no longer blocks other streams.
"""

from __future__ import annotations

import argparse
import io
import json
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from spev_tpu.errors import UserError


def _wav_bytes(audio: np.ndarray, sr: int = 22050) -> bytes:
    buf = io.BytesIO()
    pcm = (np.clip(audio, -1, 1) * 32767.0).astype("<i2")
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _wav_stream_header(sr: int = 22050) -> bytes:
    """RIFF/WAVE header with the streaming-size convention (0xFFFFFFFF
    chunk sizes): players treat the data chunk as open-ended and read
    until the connection closes."""
    import struct

    return b"".join([
        b"RIFF", struct.pack("<I", 0xFFFFFFFF), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16),
        b"data", struct.pack("<I", 0xFFFFFFFF),
    ])


def _pcm16(audio: np.ndarray) -> bytes:
    return (np.clip(audio, -1, 1) * 32767.0).astype("<i2").tobytes()


def make_handler(synth, lock: "threading.Lock | None" = None, batcher=None,
                 response_cache: int = 0):
    # `lock` is accepted for signature compatibility but no longer guards
    # compute: graph get-or-create is locked inside Synthesizer, and device
    # dispatch is thread-safe (the chip serializes execution fairly), so
    # streams interleave instead of queueing behind each other.
    del lock
    import collections
    import threading

    from spev_tpu.agents.prosody import ProsodyPolicy

    policy = ProsodyPolicy()
    # response cache: synthesis is deterministic per (text, controls), so
    # identical /synthesize requests can serve the cached wav body without
    # touching the device (the reference's deployment docs call for result
    # caching at scale; here it is a server feature, not an external Redis)
    cache: "collections.OrderedDict[str, bytes]" = collections.OrderedDict()
    cache_lock = threading.Lock()
    cache_stats = {"hits": 0, "misses": 0}

    def cache_get(key: str):
        if response_cache <= 0:
            return None
        with cache_lock:
            body = cache.get(key)
            if body is not None:
                cache.move_to_end(key)
                cache_stats["hits"] += 1
            else:
                cache_stats["misses"] += 1
            return body

    def cache_put(key: str, body: bytes):
        if response_cache <= 0:
            return
        with cache_lock:
            cache[key] = body
            cache.move_to_end(key)
            while len(cache) > response_cache:
                cache.popitem(last=False)

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                health = {
                    "status": "ok",
                    "vocoder": "hifigan" if synth.vocoder.is_neural else "griffin-lim",
                    "vocab": len(synth.vocab),
                }
                if response_cache > 0:
                    with cache_lock:
                        health["response_cache"] = {
                            "size": len(cache), "max": response_cache,
                            **cache_stats,
                        }
                self._json(200, health)
            else:
                self._json(404, {"error": "unknown path"})

        def _parse_request(self):
            n = int(self.headers.get("Content-Length", "0"))
            req = json.loads(self.rfile.read(n) or b"{}")
            text = req.get("text", "")
            kw = {}
            if "emotion" in req:
                # the CLIs validate emotion via argparse choices; the HTTP
                # surface must reject typos too — ProsodyPolicy.get_knobs
                # silently falls back to neutral (reference semantics),
                # which over HTTP would mask the client's mistake
                if req["emotion"] not in policy.styles:
                    raise UserError(
                        f"unknown emotion {req['emotion']!r}; choose from "
                        f"{sorted(policy.styles)}"
                    )
                knobs = policy.get_knobs(req["emotion"])
                kw = dict(
                    breathiness=knobs["breathiness"], roughness=knobs["roughness"],
                    brightness=knobs["brightness"], pitch_scale=knobs["pitch_scale"],
                    duration_scale=knobs["duration_scale"],
                )
            for k in ("breathiness", "roughness", "brightness",
                      "pitch_scale", "duration_scale", "energy_scale"):
                if k in req:
                    kw[k] = float(req[k])
            # advanced surface (VAD / physiology / emphasis / nasality):
            # present ⇒ the request routes through the advanced engine
            adv = {}
            for k in ("nasality", "valence", "arousal", "dominance", "age",
                      "lung_capacity"):
                if k in req:
                    adv[k] = float(req[k])
            if "word_emphasis" in req:
                adv["word_emphasis"] = str(req["word_emphasis"])
            if "speaker" in req:
                adv["speaker"] = int(req["speaker"])
            return text, kw, adv

        def do_POST(self):
            if self.path not in ("/synthesize", "/synthesize_stream"):
                self._json(404, {"error": "unknown path"})
                return
            streaming_started = False
            try:
                text, kw, adv = self._parse_request()
                if not text.strip():
                    self._json(400, {"error": "missing 'text'"})
                    return
                if adv and self.path == "/synthesize_stream":
                    self._json(400, {"error": "advanced fields are not "
                                              "supported on the streaming "
                                              "endpoint; use /synthesize"})
                    return
                if self.path == "/synthesize":
                    key = json.dumps({"text": text, **kw, **adv}, sort_keys=True)
                    body = cache_get(key)
                    if body is None:
                        if adv:
                            from spev_tpu.infer.advanced_api import (
                                synthesize_advanced_controls,
                            )

                            wav, _ = synthesize_advanced_controls(
                                synth, text, **{**kw, **adv}
                            )
                        elif batcher is not None:
                            wav, _ = batcher.submit(text, **kw)
                        else:
                            wav, _ = synth.synthesize(text, **kw)
                        body = _wav_bytes(wav, synth.audio.sample_rate)
                        cache_put(key, body)
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                # streaming: header immediately, PCM per synthesized clause;
                # no Content-Length — the closed connection ends the stream
                from spev_tpu.infer.streaming import stream_text

                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.end_headers()
                streaming_started = True
                self.wfile.write(_wav_stream_header(synth.audio.sample_rate))
                self.wfile.flush()
                # per-stream execution against the shared compiled graphs:
                # concurrent streams make interleaved clause-level progress
                for clause_wav in stream_text(synth, text, **kw):
                    self.wfile.write(_pcm16(clause_wav))
                    self.wfile.flush()
            except Exception as e:  # serving endpoint: report, don't die
                if streaming_started:
                    # the 200 + audio header is already on the wire: a JSON
                    # error body would be decoded as PCM noise — truncate the
                    # stream instead (the client sees a short read)
                    self.log_message("stream aborted: %s: %s", type(e).__name__, e)
                    self.close_connection = True
                    return
                status = 400 if isinstance(e, (UserError, ValueError, KeyError)) else 500
                try:
                    self._json(status, {"error": f"{type(e).__name__}: {e}"})
                except Exception:
                    pass  # socket already broken; nothing to report

        def log_message(self, fmt, *args):
            print(f"[serve] {self.address_string()} {fmt % args}")

    return Handler


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="spev-serve")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--hifigan_dir", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8571)
    p.add_argument("--g2p", default="auto")
    p.add_argument("--max_batch", type=int, default=16,
                   help="coalesce up to this many concurrent /synthesize "
                        "requests into one device batch (0 disables)")
    p.add_argument("--batch_window_ms", type=float, default=5.0,
                   help="how long to wait after the first queued request "
                        "for a batch to form")
    p.add_argument("--response_cache", type=int, default=256,
                   help="LRU-cache this many /synthesize responses keyed by "
                        "(text, controls) — identical requests skip the "
                        "device entirely (0 disables)")
    args = p.parse_args(argv)

    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from spev_tpu.infer.synthesis import Synthesizer

    synth = Synthesizer(args.checkpoint, hifigan_dir=args.hifigan_dir, g2p_backend=args.g2p)
    batcher = None
    if args.max_batch > 0:
        from spev_tpu.infer.batching import CoalescingBatcher

        batcher = CoalescingBatcher(synth, max_batch=args.max_batch,
                                    window_ms=args.batch_window_ms)
    server = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(synth, batcher=batcher,
                     response_cache=args.response_cache),
    )
    print(f"spev-serve listening on http://{args.host}:{args.port} "
          f"(vocoder: {'hifigan' if synth.vocoder.is_neural else 'griffin-lim'}, "
          f"batching: {args.max_batch if batcher else 'off'})")
    server.serve_forever()


if __name__ == "__main__":
    main()
