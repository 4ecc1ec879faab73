"""HTTP synthesis server — the production serving surface.

A dependency-free (stdlib http.server) endpoint over the compiled
`Synthesizer`:

    python -m spev_tpu.cli.serve --checkpoint best.spev \
        [--hifigan_dir DIR] [--host 127.0.0.1] [--port 8571]

    POST /synthesize   {"text": "...", "breathiness": 0.2, "roughness": 0.0,
                        "brightness": 0.0, "pitch_scale": 1.0,
                        "duration_scale": 1.0, "energy_scale": 1.0,
                        "emotion": "exhausted" (optional, overrides knobs),
                        "speaker": 3 (optional, advanced checkpoints)}
        → audio/wav bytes
    GET  /healthz      → {"status": "ok", "vocoder": "hifigan"|"griffin-lim"}

Graphs are compiled on first request per bucket and cached (use the
persistent compilation cache to make cold starts fast across restarts).
Requests are serialized through a lock — one TPU, one compute stream; for
throughput serving batch via `Synthesizer.synthesize_many`.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import wave
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _wav_bytes(audio: np.ndarray, sr: int = 22050) -> bytes:
    buf = io.BytesIO()
    pcm = (np.clip(audio, -1, 1) * 32767.0).astype("<i2")
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def make_handler(synth, lock: threading.Lock):
    from spev_tpu.agents.prosody import ProsodyPolicy

    policy = ProsodyPolicy()

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
                self._json(200, {
                    "status": "ok",
                    "vocoder": "hifigan" if synth.vocoder.is_neural else "griffin-lim",
                    "vocab": len(synth.vocab),
                })
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/synthesize":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                text = req.get("text", "")
                if not text.strip():
                    self._json(400, {"error": "missing 'text'"})
                    return
                kw = {}
                if "emotion" in req:
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
                with lock:
                    wav, _ = synth.synthesize(text, **kw)
                body = _wav_bytes(wav, synth.audio.sample_rate)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # serving endpoint: report, don't die
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

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
    args = p.parse_args(argv)

    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from spev_tpu.infer.synthesis import Synthesizer

    synth = Synthesizer(args.checkpoint, hifigan_dir=args.hifigan_dir, g2p_backend=args.g2p)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(synth, threading.Lock()))
    print(f"spev-serve listening on http://{args.host}:{args.port} "
          f"(vocoder: {'hifigan' if synth.vocoder.is_neural else 'griffin-lim'})")
    server.serve_forever()


if __name__ == "__main__":
    main()
