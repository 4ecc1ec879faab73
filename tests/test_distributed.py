"""Two-process jax.distributed smoke test (VERDICT r1 item 8).

Executes parallel/distributed.py for real: two CPU subprocesses (4 virtual
devices each) form an 8-device global mesh via a localhost coordinator,
assemble a globally-sharded batch with make_global_batch, and run one
sharded train step.  Both processes must report the same finite loss.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_train_step():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        re.sub(r"--xla_force_host_platform_device_count=\d+", "",
               env.get("XLA_FLAGS", ""))
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_dist_worker.py"),
             coordinator, "2", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"

    losses = []
    for out in outs:
        m = re.search(r"DIST_OK proc=\d loss=([-\d.]+) devices=8", out)
        assert m, out
        losses.append(float(m.group(1)))
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
