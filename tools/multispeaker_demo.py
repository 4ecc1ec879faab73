"""Multi-speaker training evidence — the BASELINE.json stretch config
("multi-speaker LibriTTS-R + two-phase training loop"), proven end-to-end
on the offline 3-speaker synthetic formant corpus.

What it does (one process, the docs/QUALITY.md CPU env):

1. generate a 150-utterance corpus with 3 deterministic speaker voices
   (`data/synthetic.py speaker_voice`: F0 registers ~0.72×/1.0×/1.39×,
   formant scaling 0.90×/1.0×/1.10×);
2. train the advanced model (speaker embedding, two-phase duration
   warmup) on it;
3. evaluate per speaker on the val split (`infer/evaluate.py` routes
   speaker ids through the advanced wrapper);
4. the identity proof: synthesize the SAME phoneme sequence as each
   speaker (`synthesize_advanced_controls(speaker=k)`) and measure the
   voiced F0 of the audio — the learned speaker embedding must reproduce
   the corpus's F0 registers in the right order and ratio.

Usage:  timeout 5400 python tools/multispeaker_demo.py [epochs] \
            [--out docs/demo/multispeaker_metrics.json] [--wav_dir docs/demo]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the docs/QUALITY.md env (8 virtual CPU devices)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

N_SPEAKERS = 3


def main(epochs: int = 150, out_path: str = "docs/demo/multispeaker_metrics.json",
         wav_dir: str = None) -> None:
    import tempfile

    from spev_tpu.config import ModelConfig, SpevConfig, TrainConfig
    from spev_tpu.data.batching import BucketBatcher, train_val_split
    from spev_tpu.data.dataset import SpevDataset
    from spev_tpu.data.synthetic import generate_formant_corpus, speaker_voice
    from spev_tpu.infer.evaluate import evaluate_checkpoint
    from spev_tpu.text.vocab import Vocab
    from spev_tpu.train.trainer import Trainer

    work = tempfile.mkdtemp(prefix="spev_ms_")
    root = os.path.join(work, "corpus")
    tg = generate_formant_corpus(root, n_utterances=150, seed=0,
                                 n_speakers=N_SPEAKERS)
    ds = SpevDataset(root, textgrid_dir=tg, cache_dir=os.path.join(work, "cache"),
                     g2p_backend="rules", stats_sample=60, multi_speaker=True)
    assert len(ds.speakers) == N_SPEAKERS, ds.speakers
    vocab = Vocab(ds.vocab)
    cfg = SpevConfig(
        model=ModelConfig(vocab_size=len(vocab), embed_dim=96, hidden_dim=96,
                          n_mels=80, max_phonemes=32, max_frames=256,
                          vp_output_norm=False, n_speakers=N_SPEAKERS),
        train=TrainConfig(batch_size=16, warmup_steps=50, epochs=epochs,
                          warmup_epochs=2, learning_rate=2e-3),
    )
    tr_idx, va_idx = train_val_split(len(ds), 0.1, seed=0)
    trainer = Trainer(cfg, vocab, ds.stats, ckpt_dir=os.path.join(work, "ck"),
                      log_dir=os.path.join(work, "logs"))
    bt = BucketBatcher(ds, vocab, batch_size=16, phoneme_buckets=(32,),
                       frame_buckets=(256,), indices=tr_idx)
    bv = BucketBatcher(ds, vocab, batch_size=16, phoneme_buckets=(32,),
                       frame_buckets=(256,), indices=va_idx)
    for epoch in range(epochs):
        m = trainer.train_epoch(bt.epoch(epoch))
        val = trainer.validate(bv.epoch(0))
        if epoch % 10 == 0 or epoch == epochs - 1:
            q = trainer.last_quality
            print(f"epoch {epoch}: loss {m['train_loss']:.3f} val {val:.3f} "
                  f"MCD {q.get('val_mcd_db', float('nan')):.1f} "
                  f"durerr {q.get('val_dur_err_pct', float('nan')):.1f}%",
                  flush=True)
    ckpt = trainer.save("ms_demo")

    # ---- per-speaker val-split evaluation --------------------------------
    res = evaluate_checkpoint(ckpt, ds, indices=va_idx, batch_size=8,
                              phoneme_buckets=(32,), frame_buckets=(256,))
    spk_of = {i: int(ds.load_utterance(i)["speaker_id"]) for i in va_idx}
    per_speaker = {}
    for k in range(N_SPEAKERS):
        rows = [v for i, v in res["per_utterance"].items() if spk_of[i] == k]
        per_speaker[f"spk{k}"] = {
            "n": len(rows),
            "mcd_db": round(float(np.mean([r["mcd_db"] for r in rows])), 2),
            "dur_err_pct": round(float(np.mean([r["dur_err_pct"] for r in rows])), 2),
            "f0_rmse_hz": round(float(np.mean(
                [r["f0_rmse_hz"] for r in rows if "f0_rmse_hz" in r])), 2),
        }
        print(f"spk{k} val: {per_speaker[f'spk{k}']}", flush=True)

    # ---- speaker-identity proof: same text, three speakers ---------------
    from spev_tpu.config import AudioConfig
    from spev_tpu.infer.advanced_api import synthesize_advanced_controls
    from spev_tpu.infer.synthesis import Synthesizer
    from spev_tpu.ops.features import pyin_f0
    from spev_tpu.utils.wavio import write_wav

    synth = Synthesizer(ckpt, hifigan_dir=None, model_cfg=cfg.model,
                        g2p_backend="rules",
                        phoneme_buckets=(32,), frame_buckets=(256,))
    # a held-out utterance's text (vowel-rich for stable F0 tracking)
    text = "AA M OW S IY"
    audio = AudioConfig()
    identity = {}
    for k in range(N_SPEAKERS):
        wav, _ = synthesize_advanced_controls(synth, text, speaker=k)
        f0, vflag, _vprob = pyin_f0(np.asarray(wav, np.float32),
                                    sr=audio.sample_rate,
                                    hop_length=audio.hop_length)
        f0 = np.asarray(f0)
        voiced = np.isfinite(f0) & np.asarray(vflag).astype(bool)
        hz = float(np.median(f0[voiced])) if voiced.any() else float("nan")
        identity[f"spk{k}"] = {
            "synth_f0_hz": round(hz, 2),
            "corpus_f0_mult": round(speaker_voice(k, N_SPEAKERS)[0], 3),
        }
        print(f"spk{k}: synthesized voiced F0 {hz:.1f} Hz "
              f"(corpus register {identity[f'spk{k}']['corpus_f0_mult']}x)",
              flush=True)
        if wav_dir:
            os.makedirs(wav_dir, exist_ok=True)
            write_wav(os.path.join(wav_dir, f"ms_spk{k}_same_text.wav"),
                      np.clip(np.asarray(wav), -1, 1), audio.sample_rate)

    f0s = [identity[f"spk{k}"]["synth_f0_hz"] for k in range(N_SPEAKERS)]
    ordered = bool(f0s[0] < f0s[1] < f0s[2])
    out = {
        "epochs": epochs,
        "final_quality": {kk: round(float(v), 2)
                          for kk, v in trainer.last_quality.items()},
        "aggregate_val": res["aggregate"],
        "per_speaker_val": per_speaker,
        "identity": identity,
        "identity_f0_ordered": ordered,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"per_speaker_val": per_speaker,
                      "identity_f0_ordered": ordered}, indent=1))
    print("written:", out_path)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("epochs", nargs="?", type=int, default=150)
    ap.add_argument("--out", default="docs/demo/multispeaker_metrics.json")
    ap.add_argument("--wav_dir", default=None)
    a = ap.parse_args()
    main(a.epochs, a.out, wav_dir=a.wav_dir)
