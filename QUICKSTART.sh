#!/usr/bin/env bash
# spev-tpu environment bootstrap and smoke scripts.
#
# TPU-native analog of the reference's QUICKSTART (env checks, directory
# scaffolding, optional dataset download, generated smoke-test scripts,
# system check).  Usage:
#
#   ./QUICKSTART.sh setup      # venv (if needed) + deps check + dirs + scripts
#   ./QUICKSTART.sh check      # verify environment / devices / checkpoints
#   ./QUICKSTART.sh data       # download + prepare LJSpeech (network required)
#
set -euo pipefail
cd "$(dirname "$0")"

PY=${PYTHON:-python3}

setup() {
  if ! $PY -c 'import jax' 2>/dev/null; then
    echo "jax not found — creating venv and installing requirements"
    $PY -m venv .venv
    source .venv/bin/activate
    pip install -U pip
    pip install jax flax optax numpy scipy matplotlib pytest
    PY=python
  fi
  mkdir -p data/training_data data/textgrid_data checkpoints logs vocoder_checkpoints
  echo "building native I/O runtime (optional)"
  (cd native && make -s) || echo "  g++ unavailable — pure-Python I/O fallback active"

  cat > test_inference.sh <<'EOS'
#!/usr/bin/env bash
# basic synthesis smoke test (expects a trained checkpoint)
PYTHONPATH=. python -m spev_tpu.cli.real_metrics --mode infer \
  --checkpoint "${1:-checkpoints/run_stable/best.spev}" \
  --text "This is a smoke test of the SPEV TPU synthesis system." \
  --output smoke_output.wav
EOS
  cat > test_advanced.sh <<'EOS'
#!/usr/bin/env bash
# full control-surface smoke test
PYTHONPATH=. python -m spev_tpu.cli.spev_advanced --mode infer \
  --checkpoint "${1:-checkpoints/spev_advanced/best.spev}" \
  --text "Advanced voice control smoke test." \
  --breathiness 0.3 --roughness 0.1 --nasality 0.1 \
  --valence 0.4 --arousal 0.2 --dominance 0.0 \
  --age 30 --lung_capacity 0.9 --word_emphasis "1.0,1.4,1.0,1.0" \
  --output smoke_advanced.wav
EOS
  cat > train_model.sh <<'EOS'
#!/usr/bin/env bash
# core training run (LJSpeech layout under data/training_data)
PYTHONPATH=. python -m spev_tpu.cli.spev_tts --mode train \
  --data_dir data/training_data --textgrid_dir data/textgrid_data \
  --warmup_epochs 10 --epochs 100
EOS
  cat > train_advanced.sh <<'EOS'
#!/usr/bin/env bash
PYTHONPATH=. python -m spev_tpu.cli.spev_advanced --mode train \
  --data_dir data/training_data --textgrid_dir data/textgrid_data --epochs 150
EOS
  chmod +x test_inference.sh test_advanced.sh train_model.sh train_advanced.sh
  echo "setup complete — see ./QUICKSTART.sh check"
}

check() {
  $PY - <<'EOF'
import importlib, os, glob
print("== spev-tpu system check ==")
for mod in ("jax", "flax", "optax", "numpy", "scipy"):
    try:
        m = importlib.import_module(mod)
        print(f"  [ok] {mod} {getattr(m, '__version__', '')}")
    except ImportError:
        print(f"  [MISSING] {mod}")
import jax
print(f"  devices: {jax.devices()}")
import sys; sys.path.insert(0, ".")
from spev_tpu.utils import native
print(f"  native I/O runtime: {'built' if native.ensure_built() else 'unavailable (python fallback)'}")
for d in ("data/training_data", "checkpoints", "logs"):
    n = len(glob.glob(os.path.join(d, "**", "*"), recursive=True)) if os.path.isdir(d) else -1
    print(f"  {d}: {'missing' if n < 0 else f'{n} entries'}")
ckpts = glob.glob("checkpoints/**/*.spev", recursive=True)
print(f"  checkpoints found: {len(ckpts)}")
hifi = glob.glob("vocoder_checkpoints/**/g_*", recursive=True)
print(f"  HiFi-GAN checkpoints: {len(hifi)} (Griffin-Lim fallback active when 0)")
EOF
}

data() {
  PYTHONPATH=. $PY -m spev_tpu.cli.download download --dataset single-speaker \
    --out_dir data/training_data --work_dir data/raw
  echo "For MFA alignment (optional, better durations):"
  echo "  mfa align data/training_data english_us_arpa english_us_arpa data/textgrid_data"
}

case "${1:-setup}" in
  setup) setup ;;
  check) check ;;
  data) data ;;
  *) echo "usage: $0 {setup|check|data}"; exit 1 ;;
esac
