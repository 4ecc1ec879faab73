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
#   ./QUICKSTART.sh vocoder    # fetch the LJ_FT HiFi-GAN checkpoint (network)
#   ./QUICKSTART.sh align      # MFA forced alignment -> data/textgrid_data
#
# End-state parity with the reference bootstrap
# (/root/reference/QUICKSTART.sh): directories, smoke scripts, dataset,
# vocoder checkpoint under vocoder_checkpoints/LJ_FT_T2_V3 (the --hifigan_dir
# convention: config.json + newest g_* file), and MFA TextGrids under
# data/textgrid_data (the layout spev_tpu.data.dataset consumes).
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
if not hifi:
    print("    -> ./QUICKSTART.sh vocoder  fetches LJ_FT_T2_V3")
import shutil as _sh
tg = glob.glob("data/textgrid_data/**/*.TextGrid", recursive=True)
wavs = glob.glob("data/training_data/**/*.wav", recursive=True)
print(f"  MFA: {'installed' if _sh.which('mfa') else 'not installed'}; "
      f"alignment coverage: {len(tg)}/{len(wavs)} TextGrids"
      + ("" if tg or not wavs else "  -> ./QUICKSTART.sh align (uniform-duration fallback active)"))
EOF
}

data() {
  PYTHONPATH=. $PY -m spev_tpu.cli.download download --dataset single-speaker \
    --out_dir data/training_data --work_dir data/raw
  echo "Next steps: ./QUICKSTART.sh vocoder  (HiFi-GAN checkpoint)"
  echo "            ./QUICKSTART.sh align    (MFA durations — optional but better)"
}

vocoder() {
  # LJSpeech-fine-tuned HiFi-GAN checkpoint (reference bootstrap workflow).
  # Directory convention consumed by --hifigan_dir / infer.vocoder.Vocoder:
  # config.json + the newest g_* generator file.
  mkdir -p vocoder_checkpoints
  if ls vocoder_checkpoints/LJ_FT_T2_V3/g_* >/dev/null 2>&1; then
    echo "HiFi-GAN checkpoint already present (vocoder_checkpoints/LJ_FT_T2_V3)"
    return 0
  fi
  URL='https://drive.google.com/uc?export=download&id=1n0bsIYdTV79EFxkPF4v3g-zmF_6BTrtn'
  TGZ=vocoder_checkpoints/LJ_FT_T2_V3.tar.gz
  echo "Fetching LJ_FT_T2_V3 (~150 MB)..."
  ok=false
  if command -v wget >/dev/null 2>&1; then
    wget --no-check-certificate -q "$URL" -O "$TGZ" && ok=true
  fi
  if [ "$ok" = false ] && command -v curl >/dev/null 2>&1; then
    curl -fsSL "$URL" -o "$TGZ" && ok=true
  fi
  if [ "$ok" = true ] && [ -s "$TGZ" ]; then
    tar -xzf "$TGZ" -C vocoder_checkpoints && rm -f "$TGZ"
    echo "HiFi-GAN checkpoint installed under vocoder_checkpoints/"
  else
    rm -f "$TGZ"
    echo "Offline or download failed — manual steps:"
    echo "  1. Download LJ_FT_T2_V3.tar.gz from:"
    echo "     https://drive.google.com/file/d/1n0bsIYdTV79EFxkPF4v3g-zmF_6BTrtn/view"
    echo "  2. Extract into vocoder_checkpoints/ (yields LJ_FT_T2_V3/{config.json,g_*})"
    echo "  3. Pass --hifigan_dir vocoder_checkpoints/LJ_FT_T2_V3 to the infer CLIs."
    echo "Until then the CLIs fall back to Griffin-Lim automatically."
    echo "Alternative (no download): train your own with"
    echo "  PYTHONPATH=. $PY -m spev_tpu.cli.vocoder --data_dir data/training_data \\"
    echo "      --out_dir vocoder_checkpoints/own"
    echo "then reproduce the LJ_FT workflow itself (fine-tune on your trained"
    echo "acoustic model's teacher-forced mels, closing the train/serve gap):"
    echo "  PYTHONPATH=. $PY -m spev_tpu.cli.vocoder --data_dir data/training_data \\"
    echo "      --finetune_from vocoder_checkpoints/own/gen_*.spev \\"
    echo "      --gta_checkpoint checkpoints/run1/best.spev"
    return 1
  fi
}

align() {
  # Montreal Forced Aligner workflow -> data/textgrid_data/<utt>.TextGrid,
  # the exact layout spev_tpu.data.dataset reads ('phones' interval tier;
  # falls back to uniform durations when absent).
  if ! command -v mfa >/dev/null 2>&1; then
    echo "MFA not installed.  Install (conda required):"
    echo "  conda install -c conda-forge montreal-forced-aligner -y"
    echo "  mfa model download acoustic english_us_arpa"
    echo "  mfa model download dictionary english_us_arpa"
    echo "then re-run: ./QUICKSTART.sh align"
    return 1
  fi
  mfa model download acoustic english_us_arpa || true
  mfa model download dictionary english_us_arpa || true
  echo "Aligning data/training_data (30-60 min for full LJSpeech)..."
  mfa align data/training_data english_us_arpa english_us_arpa data/textgrid_data
  echo "TextGrids in data/textgrid_data — training picks them up via --textgrid_dir"
}

demo() {
  # fully OFFLINE end-to-end proof: train acoustic model + GAN vocoder on
  # the synthetic formant corpus, write audio artifacts to docs/demo/
  # (no dataset download or upstream checkpoint needed; ~40 min CPU)
  "$PY" tools/make_demo.py "${2:-150}" docs/demo
  echo "acoustic demo in docs/demo/; for the GAN vocoder stage see"
  echo "tools/gan_copysynth.py's docstring (spev-vocoder-train recipe)"
}

case "${1:-setup}" in
  setup) setup ;;
  check) check ;;
  data) data ;;
  vocoder) vocoder ;;
  align) align ;;
  demo) demo "$@" ;;
  *) echo "usage: $0 {setup|check|data|vocoder|align|demo}"; exit 1 ;;
esac
