"""Drive any spev_tpu CLI module on CPU (dead-relay fallback — see
.claude/skills/verify/SKILL.md): forces the platform in-code BEFORE any
backend init, then runs the module as __main__.

Usage: python tools/cpu_cli.py spev_tpu.cli.real_metrics --mode train ...
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import runpy  # noqa: E402

sys.argv = sys.argv[1:]
runpy.run_module(sys.argv[0], run_name="__main__", alter_sys=True)
