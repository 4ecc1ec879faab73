"""Multi-process (DCN-style) scale-out dry run: 2 jax.distributed
processes × 4 virtual CPU devices each, one global data×model mesh, one
full sharded train step with per-process batch feeding (SURVEY §2.4
multi-slice stretch).  The committed artifact is MULTIPROC_r04.json."""

import numpy as np
import pytest

from spev_tpu.parallel.multiproc import dryrun_multiprocess


@pytest.mark.slow
def test_two_process_dryrun(tmp_path):
    out = str(tmp_path / "multiproc.json")
    res = dryrun_multiprocess(2, 4, out_json=out, timeout_s=540.0)
    assert res["ok"] is True
    assert res["n_processes"] == 2 and res["devices_per_process"] == 4
    assert res["mesh"] == {"data": 4, "model": 2}
    assert np.isfinite(res["loss"]) and res["step"] == 1
    import json, os

    assert os.path.exists(out)
    assert json.load(open(out))["ok"] is True
