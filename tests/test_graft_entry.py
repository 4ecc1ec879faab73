"""Driver-contract tests for __graft_entry__.py.

The round-1 driver artifact MULTICHIP_r01.json was red because
``dryrun_multichip`` assumed the process already had n devices; on the
single-TPU bench host it died in ``make_mesh``.  These tests pin the fix:

- direct path: with 8 virtual CPU devices (conftest), n=8 runs in-process;
- bootstrap path: n=16 > available forces the subprocess re-exec with a
  16-device virtual CPU platform.
"""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as graft  # noqa: E402


def test_dryrun_direct_path(capsys):
    assert len(jax.devices()) >= 8
    graft.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip OK" in out


@pytest.mark.slow
def test_dryrun_bootstrap_subprocess_path():
    """Requesting more devices than the parent has must re-exec and pass."""
    n = 2 * len(jax.devices())
    graft.dryrun_multichip(n)  # raises RuntimeError on child failure
