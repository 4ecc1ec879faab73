"""bench.py code paths that must not break the driver artifact — executed
at tiny configuration on CPU.

Round 3: the driver contract is ONE JSON line on stdout with rc 0 no matter
what state the TPU relay is in (BENCH_r02.json was a traceback because a dead
relay blocked backend init forever).  These tests pin the three survivability
mechanisms: the subprocess backend probe, the structured-unavailability emit,
and the global-deadline watchdog's partial emit."""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from spev_tpu.config import ModelConfig
from spev_tpu.models.hifigan import HiFiGANConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code=None, argv=None, env_extra=None, timeout=120):
    env = dict(os.environ)
    env.update(env_extra or {})
    cmd = [sys.executable] + (["-c", code] if code else argv)
    return subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                          env=env, timeout=timeout)


def test_probe_backend_alive_cpu():
    import bench

    r = bench.probe_backend(time.monotonic() + 60)
    assert r["ok"] and r["platform"] == "cpu" and r["n_devices"] >= 1


def test_bench_emits_structured_unavailability_not_traceback():
    # An unusable backend (bogus platform name) must yield rc 0 and one
    # parseable JSON line flagging tpu_unavailable — the round-2 failure mode.
    r = _run(argv=["bench.py"],
             env_extra={"JAX_PLATFORMS": "no_such_platform",
                        "SPEV_BENCH_BUDGET": "40"})
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, r.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "synthesis_rtf_x_realtime"
    assert rec["error"] == "tpu_unavailable"
    assert rec["probe_attempts"] >= 1


def test_watchdog_emits_partial_result_and_exits_zero():
    # If anything wedges after the probe (backend hang mid-run), the watchdog
    # must emit the partial RESULT and exit 0 instead of dying on a timeout.
    code = (
        "import time, bench\n"
        "bench.RESULT['value'] = 123.0\n"
        "bench._start_watchdog(time.monotonic() + 0.5)\n"
        "time.sleep(30)\n"
    )
    t0 = time.monotonic()
    r = _run(code=code, timeout=20)
    assert time.monotonic() - t0 < 15
    assert r.returncode == 0
    rec = json.loads(r.stdout.strip())
    assert rec["error"] == "deadline_exceeded" and rec["value"] == 123.0


def test_emit_is_idempotent():
    code = (
        "import bench\n"
        "bench._emit(error='first')\n"
        "bench._emit(error='second')\n"
    )
    r = _run(code=code)
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1
    assert json.loads(lines[0])["error"] == "first"


def test_bounded_records_stage_errors():
    # Round 4 postmortem: a swallowed stage failure must leave a trace in the
    # artifact (BENCH_r03 lost adaptive_serving_rtf with no evidence why).
    import bench

    bench.RESULT.pop("stage_errors", None)

    def boom():
        raise ValueError("kaput")

    assert bench._bounded(boom, 5, "mystage") is None
    assert "kaput" in bench.RESULT["stage_errors"]["mystage"]

    def slow():
        time.sleep(10)

    assert bench._bounded(slow, 1, "slowstage") is None
    assert "deadline" in bench.RESULT["stage_errors"]["slowstage"]
    bench.RESULT.pop("stage_errors", None)


@pytest.mark.slow
def test_measure_adaptive_serving_tiny():
    from bench import measure_adaptive_serving

    cfg = ModelConfig(vocab_size=32, embed_dim=32, hidden_dim=32, n_mels=8)
    vcfg = HiFiGANConfig(
        resblock="2", upsample_rates=(8, 8, 4), upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), num_mels=8,
    )
    rtf = measure_adaptive_serving(
        n_requests=6, B=3, model_cfg=cfg, voc_cfg=vcfg,
        frame_buckets=(64, 128), phoneme_buckets=(64,),
    )
    assert np.isfinite(rtf) and rtf > 0
