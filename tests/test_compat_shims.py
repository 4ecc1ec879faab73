"""Reference-compatible root entry points: a user of the reference can run
``python spev_real_metrics.py ...`` / ``import dataset_loader`` verbatim."""

import subprocess
import sys

import pytest

SHIM_HELP = [
    ("spev_real_metrics.py", ["--help"]),
    ("spev_tts.py", ["--help"]),
    ("spev_advanced.py", ["--help"]),
    ("spev_embodied_core.py", ["--help"]),
    ("spev_temporal_policy.py", ["--help"]),
    ("download_datasets.py", ["--help"]),
    ("advanced__download_dataset.py", ["--help"]),
]


@pytest.mark.parametrize("script,args", SHIM_HELP)
def test_shim_help_runs(script, args, repo_root):
    r = subprocess.run(
        [sys.executable, str(repo_root / script), *args],
        capture_output=True, text=True, cwd=repo_root, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "usage" in (r.stdout + r.stderr).lower()


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
