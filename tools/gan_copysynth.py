"""Copy-synthesis evaluation of an in-framework-trained HiFi-GAN.

Trains nothing itself — point it at a generator checkpoint produced by
`spev-vocoder-train` (cli/vocoder.py) and at wav files; it vocodes each
wav's OWN mel (copy synthesis, the standard vocoder metric: isolates the
vocoder from the acoustic model) and reports round-trip MCD vs the
Griffin-Lim fallback.

Usage:
  python -m spev_tpu.cli.vocoder --data_dir corpus --name run --config v3 \
      --steps 2000 --batch_size 16
  python tools/gan_copysynth.py checkpoints/run/gen_00002000.spev \
      wav1.wav [wav2.wav ...] [--out_dir docs/demo]
"""

import argparse
import os
import sys

# --cpu must take effect before any spev_tpu import can init the TPU
# backend (e.g. to score snapshots while a training run owns the chip)
if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from spev_tpu.config import AudioConfig  # noqa: E402
from spev_tpu.data.dataset import FeatureExtractor  # noqa: E402
from spev_tpu.diag.quality import mel_cepstral_distortion  # noqa: E402
from spev_tpu.infer.vocoder import Vocoder  # noqa: E402
from spev_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator  # noqa: E402
from spev_tpu.train.checkpoint import load_params  # noqa: E402
from spev_tpu.utils.wavio import read_wav, write_wav  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="gen_*.spev from spev-vocoder-train")
    ap.add_argument("wavs", nargs="+")
    ap.add_argument("--config", default="v3", choices=["v1", "v3"])
    ap.add_argument("--out_dir", default=None, help="write *_copysynth_gan.wav here")
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (score snapshots beside a busy chip)")
    ap.add_argument("--skip_gl", action="store_true",
                    help="skip the Griffin-Lim comparison column")
    args = ap.parse_args()

    params, _, _ = load_params(args.checkpoint)
    cfg = HiFiGANConfig() if args.config == "v1" else HiFiGANConfig.v3()
    voc = Vocoder(generator=HiFiGANGenerator(cfg, params))
    gl = None if args.skip_gl else Vocoder(None)
    fx = FeatureExtractor(AudioConfig(), use_pallas=False)

    mcds = []
    for path in args.wavs:
        y, sr = read_wav(path)
        mel = fx.full_features(y)[0].T
        wav_gan = np.asarray(voc.infer(mel))
        mel_gan = fx.full_features(wav_gan[: len(y)])[0].T
        T = min(len(mel), len(mel_gan))
        line = ""
        if gl is not None:
            wav_gl = np.asarray(gl.infer(mel))
            mel_gl = fx.full_features(wav_gl[: len(y)])[0].T
            T = min(T, len(mel_gl))
            line = f" vs GL {float(mel_cepstral_distortion(mel_gl[:T], mel[:T])):.2f} dB"
        mcd_gan = float(mel_cepstral_distortion(mel_gan[:T], mel[:T]))
        mcds.append(mcd_gan)
        name = os.path.splitext(os.path.basename(path))[0]
        print(f"{name}: copy-synthesis MCD GAN {mcd_gan:.2f} dB{line}")
        if args.out_dir:
            os.makedirs(args.out_dir, exist_ok=True)
            write_wav(os.path.join(args.out_dir, f"{name}_copysynth_gan.wav"),
                      np.clip(wav_gan, -1, 1), 22050)
    print(f"mean over {len(mcds)}: {np.mean(mcds):.3f} dB "
          f"(min {min(mcds):.2f} max {max(mcds):.2f})")


if __name__ == "__main__":
    main()
