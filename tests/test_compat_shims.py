"""Reference-compatible root entry points: a user of the reference can run
``python spev_real_metrics.py ...`` / ``import dataset_loader`` verbatim."""

import subprocess
import sys

import pytest

SHIMS = [
    "spev_real_metrics.py",
    "spev_tts.py",
    "spev_advanced.py",
    "spev_embodied_core.py",
    "spev_temporal_policy.py",
    "download_datasets.py",
    "advanced__download_dataset.py",
]

# One subprocess drives every shim's --help via runpy (argparse exits with
# SystemExit(0) after printing usage): each shim still executes exactly as
# ``python <shim> --help`` would, but the ~3 s interpreter+jax startup is
# paid once instead of seven times.
_DRIVER = r"""
import io, runpy, sys
for script in sys.argv[1:]:
    sys.argv = [script, "--help"]
    out = io.StringIO()
    real = sys.stdout
    sys.stdout = out
    code = 0
    try:
        runpy.run_path(script, run_name="__main__")
    except SystemExit as e:
        code = int(e.code or 0)
    finally:
        sys.stdout = real
    print(f"===SHIM {script} rc={code}===")
    print(out.getvalue())
"""


def test_shim_help_runs(repo_root):
    r = subprocess.run(
        [sys.executable, "-c", _DRIVER, *SHIMS],
        capture_output=True, text=True, cwd=repo_root, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-800:]
    for script in SHIMS:
        marker = f"===SHIM {script} rc=0==="
        assert marker in r.stdout, (script, r.stdout[-800:], r.stderr[-400:])
        section = r.stdout.split(marker, 1)[1].split("===SHIM", 1)[0]
        assert "usage" in section.lower(), (script, section[:300])


def test_shim_flag_surface(repo_root):
    """The real_metrics shim exposes the reference's flag names."""
    r = subprocess.run(
        [sys.executable, str(repo_root / "spev_real_metrics.py"), "--help"],
        capture_output=True, text=True, cwd=repo_root, timeout=300,
    )
    for flag in ("--mode", "--data_dir", "--textgrid_dir", "--breathiness",
                 "--roughness", "--brightness", "--pitch_scale",
                 "--duration_scale", "--energy_scale", "--hifigan_dir"):
        assert flag in r.stdout, flag


def test_dataset_loader_imports():
    import dataset_loader

    assert hasattr(dataset_loader, "SpevDataset")
    assert hasattr(dataset_loader, "BucketBatcher")
    assert hasattr(dataset_loader, "import_monolithic_cache")


def test_spev_tts_exports():
    import spev_tts

    assert callable(spev_tts.main) and callable(spev_tts.inference_mode)
