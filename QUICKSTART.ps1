# spev-tpu environment bootstrap (PowerShell variant of QUICKSTART.sh).
# Usage:  .\QUICKSTART.ps1 [setup|check]
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

switch ($Action) {
    "setup" { Invoke-Setup }
    "check" { Invoke-Check }
    default { Write-Host "usage: .\QUICKSTART.ps1 [setup|check]" }
}
