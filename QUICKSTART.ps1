# spev-tpu environment bootstrap (PowerShell variant of QUICKSTART.sh).
# Usage:  .\QUICKSTART.ps1 [setup|check|vocoder|align]
param([string]$Action = "setup")

$ErrorActionPreference = "Stop"
Set-Location $PSScriptRoot

function Invoke-Setup {
    $py = "python"
    try { & $py -c "import jax" 2>$null } catch {
        Write-Host "jax not found - creating venv and installing requirements"
        & $py -m venv .venv
        & .\.venv\Scripts\Activate.ps1
        pip install -U pip
        pip install jax flax optax numpy scipy matplotlib pytest
    }
    foreach ($d in @("data\training_data", "data\textgrid_data", "checkpoints", "logs", "vocoder_checkpoints")) {
        New-Item -ItemType Directory -Force -Path $d | Out-Null
    }
    @"
python -m spev_tpu.cli.real_metrics --mode infer ``
  --checkpoint checkpoints\run_stable\best.spev ``
  --text "This is a smoke test of the SPEV TPU synthesis system." ``
  --output smoke_output.wav
"@ | Set-Content test_inference.ps1
    Write-Host "setup complete - run .\QUICKSTART.ps1 check"
}

function Invoke-Check {
    $env:PYTHONPATH = "$PSScriptRoot;$env:PYTHONPATH"
    python -c @"
import importlib
print('== spev-tpu system check ==')
for mod in ('jax', 'flax', 'optax', 'numpy', 'scipy'):
    try:
        m = importlib.import_module(mod)
        print(f'  [ok] {mod} {getattr(m, "__version__", "")}')
    except ImportError:
        print(f'  [MISSING] {mod}')
import jax
print(f'  devices: {jax.devices()}')
"@
}

function Invoke-Vocoder {
    # LJSpeech-fine-tuned HiFi-GAN checkpoint; directory convention is
    # config.json + newest g_* consumed via --hifigan_dir.
    New-Item -ItemType Directory -Force -Path "vocoder_checkpoints" | Out-Null
    if (Test-Path "vocoder_checkpoints\LJ_FT_T2_V3\g_*") {
        Write-Host "HiFi-GAN checkpoint already present"; return
    }
    $url = "https://drive.google.com/uc?export=download&id=1n0bsIYdTV79EFxkPF4v3g-zmF_6BTrtn"
    $tgz = "vocoder_checkpoints\LJ_FT_T2_V3.tar.gz"
    try {
        Invoke-WebRequest -Uri $url -OutFile $tgz
        tar -xzf $tgz -C vocoder_checkpoints
        Remove-Item $tgz
        Write-Host "HiFi-GAN checkpoint installed"
    } catch {
        Write-Host "Offline or download failed - manual steps:"
        Write-Host "  1. Download LJ_FT_T2_V3.tar.gz from https://drive.google.com/file/d/1n0bsIYdTV79EFxkPF4v3g-zmF_6BTrtn/view"
        Write-Host "  2. Extract into vocoder_checkpoints\"
        Write-Host "  3. Pass --hifigan_dir vocoder_checkpoints\LJ_FT_T2_V3 to the infer CLIs."
        Write-Host "Until then the CLIs fall back to Griffin-Lim automatically."
    }
}

function Invoke-Align {
    if (-not (Get-Command mfa -ErrorAction SilentlyContinue)) {
        Write-Host "MFA not installed.  Install (conda required):"
        Write-Host "  conda install -c conda-forge montreal-forced-aligner -y"
        Write-Host "  mfa model download acoustic english_us_arpa"
        Write-Host "  mfa model download dictionary english_us_arpa"
        return
    }
    mfa model download acoustic english_us_arpa
    mfa model download dictionary english_us_arpa
    mfa align data\training_data english_us_arpa english_us_arpa data\textgrid_data
}

switch ($Action) {
    "setup" { Invoke-Setup }
    "check" { Invoke-Check }
    "vocoder" { Invoke-Vocoder }
    "align" { Invoke-Align }
    default { Write-Host "usage: .\QUICKSTART.ps1 [setup|check|vocoder|align]" }
}
