"""Trainable-VAD evidence — the learned emotion embedding reproduces the
corpus's per-emotion prosody registers (VERDICT r3 #1 done-criterion; the
multi-speaker identity proof's emotion sibling).

What it does (one process, the docs/QUALITY.md CPU env):

1. generate an emotion-conditioned formant corpus
   (`data/synthetic.py generate_formant_corpus(emotions=...)`: each
   emotion applies its log-linear VAD→prosody register — arousal raises
   F0/level and quickens rate, etc. — and the label rides the filename
   suffix);
2. train the advanced model with the VAD pathway (emotion labels →
   `data/emotion.py` VAD targets → `vad_proj` gradient);
3. verify the projection learned (non-zero weights);
4. the register proof: synthesize the SAME phoneme sequence under each
   emotion's (V, A, D) — through the LEARNED embedding only, no
   rule-based knobs — and measure voiced F0 and frame count of the
   audio: the orderings must match the corpus's registers
   (F0: happy > neutral > sad; duration: sad > neutral > happy).

Usage:  timeout 5400 python tools/emotion_register_demo.py [epochs] \
            [--out docs/demo/emotion_metrics.json] [--wav_dir docs/demo]
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

EMOTIONS = ("neutral", "happy", "sad", "angry")


def main(epochs: int = 150, out_path: str = "docs/demo/emotion_metrics.json",
         wav_dir: str = None) -> None:
    import tempfile

    from spev_tpu.config import AudioConfig, ModelConfig, SpevConfig, TrainConfig
    from spev_tpu.data.batching import BucketBatcher, train_val_split
    from spev_tpu.data.dataset import SpevDataset
    from spev_tpu.data.emotion import EMOTION_VAD
    from spev_tpu.data.synthetic import emotion_prosody, generate_formant_corpus
    from spev_tpu.text.vocab import Vocab
    from spev_tpu.train.trainer import Trainer

    work = tempfile.mkdtemp(prefix="spev_emo_")
    root = os.path.join(work, "corpus")
    tg = generate_formant_corpus(root, n_utterances=160, seed=0,
                                 emotions=EMOTIONS)
    ds = SpevDataset(root, textgrid_dir=tg, cache_dir=os.path.join(work, "cache"),
                     g2p_backend="rules", stats_sample=60, emotion_vad=True)
    assert sorted(ds.emotions) == sorted(EMOTIONS), ds.emotions
    vocab = Vocab(ds.vocab)
    cfg = SpevConfig(
        model=ModelConfig(vocab_size=len(vocab), embed_dim=96, hidden_dim=96,
                          n_mels=80, max_phonemes=32, max_frames=256,
                          vp_output_norm=False, use_vad=True),
        train=TrainConfig(batch_size=16, warmup_steps=50, epochs=epochs,
                          warmup_epochs=2, learning_rate=2e-3),
    )
    tr_idx, va_idx = train_val_split(len(ds), 0.1, seed=0)
    trainer = Trainer(cfg, vocab, ds.stats, ckpt_dir=os.path.join(work, "ck"),
                      log_dir=os.path.join(work, "logs"))
    assert "vad_proj" in trainer.state.params["advanced"]
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
    ckpt = trainer.save("emo_demo", include_opt=False)

    w = np.asarray(trainer.state.params["advanced"]["vad_proj"]["weight"])
    assert np.abs(w).max() > 0, "vad_proj never received gradient"
    print(f"vad_proj learned: |w| mean {np.abs(w).mean():.4f} "
          f"max {np.abs(w).max():.4f}", flush=True)

    out = measure_registers(ckpt, out_path, wav_dir=wav_dir, extra={
        "epochs": epochs,
        "final_quality": {k: round(float(v), 2)
                          for k, v in trainer.last_quality.items()},
        "vad_proj_abs_mean": round(float(np.abs(w).mean()), 5),
        "per_emotion_val": per_emotion_eval(ckpt, ds, va_idx),
    })
    return out


def per_emotion_eval(ckpt: str, ds, va_idx) -> dict:
    """Held-out eval rows grouped by emotion label (the multi-speaker
    per-speaker table's emotion sibling, VERDICT r4 #5): MCD, duration
    error, and F0 RMSE per emotion.  The eval routes each batch's VAD
    target through the advanced wrapper exactly as training did
    (`infer/evaluate.py` use_vad path)."""
    from spev_tpu.data.emotion import EMOTION_VAD
    from spev_tpu.infer.evaluate import evaluate_checkpoint

    res = evaluate_checkpoint(ckpt, ds, indices=list(va_idx), batch_size=16,
                              phoneme_buckets=(32,), frame_buckets=(256,))
    # dataset index -> emotion via the utterance's stored VAD target
    # (nearest-neighbor match: the cached target is float32, so exact
    # tuple equality against the python-float table misses)
    emos = sorted(EMOTION_VAD)
    table = np.asarray([EMOTION_VAD[e] for e in emos], np.float64)
    emo_of = {}
    for i in va_idx:
        v = np.asarray(ds.load_utterance(i)["vad"], np.float64)
        emo_of[i] = emos[int(np.argmin(np.sum((table - v) ** 2, axis=1)))]
    rows = {}
    for emo in sorted(set(emo_of.values())):
        rs = [v for i, v in res["per_utterance"].items() if emo_of[i] == emo]
        if not rs:
            continue
        rows[emo] = {
            "n": len(rs),
            "mcd_db": round(float(np.mean([r["mcd_db"] for r in rs])), 2),
            "dur_err_pct": round(float(np.mean(
                [r["dur_err_pct"] for r in rs])), 2),
            "f0_rmse_hz": round(float(np.mean(
                [r["f0_rmse_hz"] for r in rs if "f0_rmse_hz" in r])), 2),
        }
        print(f"{emo} val: {rows[emo]}", flush=True)
    return rows


def measure_registers(ckpt: str, out_path: str, wav_dir=None, extra=None):
    """Register proof on a trained checkpoint: the SAME phoneme sequence
    under each emotion's (V, A, D), through the LEARNED embedding only.

    Primary register signal = the model's own predicted pitch head,
    de-normalized to Hz with the checkpoint stats (median over voiced
    phones) — the direct learned F0 register, with no vocoder confound.
    The audio-level pyin measurement is kept as a secondary column: at
    dashboard scale the Griffin-Lim phase noise can drop below pyin's
    voicing threshold (observed: 3/4 emotions unvoiced at 150 epochs),
    which is an artifact of the fallback vocoder, not of the register."""
    import jax
    import jax.numpy as jnp

    from spev_tpu.config import AudioConfig
    from spev_tpu.data.emotion import EMOTION_VAD
    from spev_tpu.data.synthetic import emotion_prosody
    from spev_tpu.infer.synthesis import Synthesizer
    from spev_tpu.models.advanced import apply_advanced
    from spev_tpu.ops.features import pyin_f0
    from spev_tpu.utils.wavio import write_wav

    synth = Synthesizer(ckpt, hifigan_dir=None, g2p_backend="rules",
                        phoneme_buckets=(32,), frame_buckets=(256,))
    text = "AA M OW S IY AH N AA"  # vowel-rich for stable F0 tracking
    ids = synth.phonemes_to_ids(synth.g2p.phonemes(text))
    audio = AudioConfig()
    p_mean = float(synth.stats.get("p_mean", 0.0))
    p_std = float(synth.stats.get("p_std", 1.0))
    P = synth.phoneme_buckets[-1]
    ids_pad = np.zeros((1, P), np.int32)
    ids_pad[0, : len(ids)] = ids
    lengths = jnp.asarray([len(ids)], jnp.int32)

    @jax.jit
    def fwd(params, ids_b, lens, vad):
        return apply_advanced(params, synth.model_cfg, ids_b, lens, vad=vad)

    registers = {}
    for emo, vad in EMOTION_VAD.items():
        if emo not in ("neutral", "happy", "sad", "angry"):
            continue
        # LEARNED pathway only: vad feeds vad_proj through the advanced
        # wrapper; no rule-based knob mapping in the loop
        out_d = fwd(synth.params, jnp.asarray(ids_pad), lengths,
                    jnp.asarray([vad], jnp.float32))
        pp = np.asarray(out_d["pitch_pred"])[0, : len(ids)]
        pred_hz_all = np.exp(pp * p_std + p_mean)
        # median over mid-register phones: padding/silence phones predict
        # the unvoiced 0-target (= exp(p_mean) after de-normalization)
        voiced_mask = np.abs(pp) > 1e-3
        pred_hz = float(np.median(pred_hz_all[voiced_mask])
                        if voiced_mask.any() else np.median(pred_hz_all))

        wav, mel = synth.synthesize_ids(ids, vad=vad)
        f0, vflag, _ = pyin_f0(np.asarray(wav, np.float32),
                               sr=audio.sample_rate,
                               hop_length=audio.hop_length)
        f0 = np.asarray(f0)
        voiced = np.isfinite(f0) & np.asarray(vflag).astype(bool)
        hz = float(np.median(f0[voiced])) if voiced.any() else float("nan")
        corpus_f0, corpus_dur, _lvl = emotion_prosody(vad)
        registers[emo] = {
            "vad": list(vad),
            "pred_f0_hz": round(pred_hz, 2),
            "synth_f0_hz": round(hz, 2),
            "synth_frames": int(mel.shape[0]),
            "corpus_f0_mult": round(corpus_f0, 3),
            "corpus_dur_mult": round(corpus_dur, 3),
        }
        print(f"{emo}: predicted F0 {pred_hz:.1f} Hz (audio pyin {hz:.1f}), "
              f"{mel.shape[0]} frames "
              f"(corpus registers {corpus_f0:.3f}x F0, {corpus_dur:.3f}x dur)",
              flush=True)
        if wav_dir:
            os.makedirs(wav_dir, exist_ok=True)
            write_wav(os.path.join(wav_dir, f"emo_{emo}_same_text.wav"),
                      np.clip(np.asarray(wav), -1, 1), audio.sample_rate)

    EMOTIONS_ = ("neutral", "happy", "sad", "angry")
    f0_of = {e: registers[e]["pred_f0_hz"] for e in EMOTIONS_}
    fr_of = {e: registers[e]["synth_frames"] for e in EMOTIONS_}
    f0_ordered = bool(f0_of["happy"] > f0_of["neutral"] > f0_of["sad"])
    dur_ordered = bool(fr_of["sad"] > fr_of["neutral"]
                       and fr_of["neutral"] >= fr_of["happy"])
    out = {
        **(extra or {}),
        "registers": registers,
        "f0_register_ordered": f0_ordered,
        "duration_register_ordered": dur_ordered,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"f0_register_ordered": f0_ordered,
                      "duration_register_ordered": dur_ordered}, indent=1))
    print("written:", out_path)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("epochs", nargs="?", type=int, default=150)
    ap.add_argument("--out", default="docs/demo/emotion_metrics.json")
    ap.add_argument("--wav_dir", default=None)
    ap.add_argument("--measure_only", default=None, metavar="CKPT",
                    help="skip training; re-run the register measurement "
                         "on an existing advanced checkpoint")
    a = ap.parse_args()
    if a.measure_only:
        measure_registers(a.measure_only, a.out, wav_dir=a.wav_dir)
    else:
        main(a.epochs, a.out, wav_dir=a.wav_dir)
