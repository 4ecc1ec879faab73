"""Checkpoint / numerics parity against a PyTorch twin.

Builds a torch model implementing the reference semantics (SURVEY.md §2.1:
same architecture, clamp contract, duration decode, LayerNorm(1) output norm,
length-regulator loop), saves its state_dict with torch.save, converts it via
`spev_tpu.utils.torch_loader`, and checks the JAX graph reproduces the torch
outputs to well under the 1e-3 MAE target (BASELINE.md).

The torch twin is a test fixture written for this suite — the comparison is
meaningful because both sides were implemented independently against the
documented contract.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from spev_tpu.config import ModelConfig
from spev_tpu.models.fastspeech2 import apply_fastspeech2
from spev_tpu.utils.torch_loader import (
    fastspeech2_params_from_state_dict,
    fastspeech2_params_to_state_dict,
    load_checkpoint,
    read_torch_pickle,
)

H, HEADS, NMEL, VOCAB = 32, 2, 8, 23


class TorchVP(tnn.Module):
    def __init__(self, h):
        super().__init__()
        mods = []
        for _ in range(2):
            mods += [tnn.Conv1d(h, h, 3, padding=1), tnn.ReLU(), tnn.LayerNorm(h), tnn.Dropout(0.1)]
        self.layers = tnn.Sequential(*mods)
        self.proj = tnn.Linear(h, 1)
        self.output_norm = tnn.LayerNorm(1)

    def forward(self, x):
        h = x.transpose(1, 2)
        for m in self.layers:
            if isinstance(m, tnn.LayerNorm):
                h = m(h.transpose(1, 2)).transpose(1, 2)
            else:
                h = m(h)
        return self.output_norm(self.proj(h.transpose(1, 2))).squeeze(-1)


class TorchFFT(tnn.Module):
    def __init__(self, h):
        super().__init__()
        self.attention = tnn.MultiheadAttention(h, HEADS, dropout=0.1, batch_first=True)
        self.norm1 = tnn.LayerNorm(h)
        self.conv1 = tnn.Conv1d(h, h * 4, 9, padding=4)
        self.conv2 = tnn.Conv1d(h * 4, h, 9, padding=4)
        self.norm2 = tnn.LayerNorm(h)

    def forward(self, x, mask):
        a, _ = self.attention(x, x, x, key_padding_mask=mask)
        x = self.norm1(x + a)
        h = self.conv2(torch.relu(self.conv1(x.transpose(1, 2)))).transpose(1, 2)
        return self.norm2(x + h)


class TorchTwin(tnn.Module):
    """Reference-semantics FastSpeech2 (eval-mode paths only)."""

    def __init__(self):
        super().__init__()
        self.embedding = tnn.Embedding(VOCAB, H, padding_idx=0)
        self.encoder_blocks = tnn.ModuleList(TorchFFT(H) for _ in range(4))
        self.decoder_blocks = tnn.ModuleList(TorchFFT(H) for _ in range(4))
        for n in ("duration", "pitch", "energy", "breath", "rough", "bright"):
            setattr(self, f"{n}_predictor", TorchVP(H))
        for n in ("pitch", "energy", "breath", "rough", "bright"):
            setattr(self, f"{n}_embedding", tnn.Conv1d(1, H, 3, padding=1))
        self.mel_linear = tnn.Linear(H, NMEL)

    @staticmethod
    def _regulate(x, durs):
        outs, lens = [], []
        for b in range(x.size(0)):
            segs = []
            for t in range(x.size(1)):
                d = durs[b, t].item()
                if not np.isfinite(d) or d < 0 or d > 1000:
                    d = 0
                if int(d) > 0:
                    segs.append(x[b, t : t + 1].repeat(int(d), 1))
            if not segs:
                outs.append(torch.zeros(1, x.size(2)))
                lens.append(1)
            else:
                outs.append(torch.cat(segs))
                lens.append(outs[-1].size(0))
        m = max(lens)
        return (
            torch.stack([tF.pad(o, (0, 0, 0, m - o.size(0))) for o in outs]),
            torch.tensor(lens),
        )

    def forward(self, ids, lengths, targets=None, overrides=None, d_c=1.0, p_c=1.0, e_c=1.0):
        x = self.embedding(ids)
        mask = torch.arange(x.size(1))[None, :] >= lengths[:, None]
        for blk in self.encoder_blocks:
            x = blk(x, mask)
            x = torch.nan_to_num(x, nan=0.0)
        ld = torch.clamp(self.duration_predictor(x), -4, 4)
        pp = torch.clamp(self.pitch_predictor(x), -2.5, 2.5)
        ep = torch.clamp(self.energy_predictor(x), -2.5, 2.5)
        brp = torch.clamp(self.bright_predictor(x), -2.5, 2.5)
        bp = torch.clamp(self.breath_predictor(x), 0.0, 0.8)
        rp = torch.clamp(self.rough_predictor(x), 0.0, 1.5)
        if targets is not None:
            durs = targets["durs"]
            pitch, energy = targets["pitch"], targets["energy"]
            breath, rough, bright = targets["breath"], targets["rough"], targets["bright"]
        else:
            durs = torch.clamp((torch.exp(ld) - 1) * d_c, min=0, max=500).round().long()
            pitch, energy = pp * p_c, ep * e_c
            breath, rough, bright = bp, rp, brp
            if overrides:
                breath = overrides.get("breath", breath)
                rough = overrides.get("rough", rough)
                bright = overrides.get("bright", bright)
        xe, mel_len = self._regulate(x, durs)

        def ef(f):
            e, _ = self._regulate(f.unsqueeze(-1), durs)
            return e.transpose(1, 2)

        pitch, energy = ef(pitch).clamp(-3, 3), ef(energy).clamp(-3, 3)
        breath, rough = ef(breath).clamp(0, 1), ef(rough).clamp(0, 2)
        bright = ef(bright).clamp(-3, 3)
        dec = (
            xe.transpose(1, 2)
            + self.pitch_embedding(pitch)
            + self.energy_embedding(energy)
            + self.breath_embedding(breath)
            + self.rough_embedding(rough)
            + self.bright_embedding(bright)
        ).transpose(1, 2)
        mm = torch.arange(dec.size(1))[None, :] >= mel_len[:, None]
        for blk in self.decoder_blocks:
            dec = blk(dec, mm)
            dec = torch.nan_to_num(dec, nan=0.0)
        mel = torch.clamp(self.mel_linear(dec), -10, 2)
        return {
            "mel": mel, "ld": ld, "pp": pp, "ep": ep, "bp": bp, "rp": rp, "brp": brp,
            "mel_len": mel_len, "durs": durs,
        }


@pytest.fixture(scope="module")
def twin_and_params(tmp_path_factory):
    torch.manual_seed(0)
    twin = TorchTwin().eval()
    path = tmp_path_factory.mktemp("ckpt") / "twin.pt"
    torch.save({"model": twin.state_dict(), "vocab": ["<PAD>"] * VOCAB}, str(path))
    ckpt = load_checkpoint(str(path))
    params = fastspeech2_params_from_state_dict(ckpt["model"])
    params = jax.tree.map(jnp.asarray, params)
    return twin, params, str(path)


def _cfg(max_ph=16, max_fr=96):
    return ModelConfig(
        vocab_size=VOCAB, embed_dim=H, hidden_dim=H, n_mels=NMEL, n_heads=HEADS,
        max_phonemes=max_ph, max_frames=max_fr,
    )


def test_numpy_reader_matches_torch_load(twin_and_params):
    twin, _, path = twin_and_params
    np_ckpt = read_torch_pickle(path)
    sd = twin.state_dict()
    for k, v in np_ckpt["model"].items():
        np.testing.assert_allclose(v, sd[k].numpy(), atol=0)


def test_state_dict_roundtrip(twin_and_params):
    twin, params, _ = twin_and_params
    sd = fastspeech2_params_to_state_dict(jax.tree.map(np.asarray, params))
    for k, v in twin.state_dict().items():
        np.testing.assert_allclose(sd[k], v.numpy(), atol=0)


def test_inference_parity_single_utterance(twin_and_params):
    twin, params, _ = twin_and_params
    cfg = _cfg()
    rng = np.random.default_rng(0)
    n_ph = 11
    ids = rng.integers(1, VOCAB, size=(1, n_ph))
    breath = np.full((1, n_ph), 0.3, np.float32)

    with torch.no_grad():
        t_out = twin(
            torch.tensor(ids), torch.tensor([n_ph]),
            overrides={"breath": torch.tensor(breath)}, d_c=1.2, p_c=0.9, e_c=1.1,
        )

    ids_pad = np.zeros((1, cfg.max_phonemes), np.int32)
    ids_pad[0, :n_ph] = ids
    breath_pad = np.zeros((1, cfg.max_phonemes), np.float32)
    breath_pad[0, :n_ph] = breath
    j_out = apply_fastspeech2(
        params, cfg, jnp.asarray(ids_pad), jnp.asarray([n_ph]),
        target_breath=jnp.asarray(breath_pad), d_control=1.2, p_control=0.9, e_control=1.1,
    )

    L = int(t_out["mel_len"][0])
    assert int(j_out["mel_len"][0]) == L
    np.testing.assert_array_equal(
        np.asarray(j_out["durations"])[0, :n_ph], t_out["durs"][0].numpy()
    )
    mel_t = t_out["mel"][0, :L].numpy()
    mel_j = np.asarray(j_out["mel_pred"])[0, :L]
    mae = np.abs(mel_t - mel_j).mean()
    assert mae < 1e-4, f"mel MAE {mae}"
    for tk, jk in [("ld", "log_duration_pred"), ("pp", "pitch_pred"), ("bp", "breath_pred")]:
        np.testing.assert_allclose(
            t_out[tk][0, :n_ph].numpy(), np.asarray(j_out[jk])[0, :n_ph], atol=1e-4
        )


def test_teacher_forced_parity_equal_length_batch(twin_and_params):
    twin, params, _ = twin_and_params
    cfg = _cfg()
    rng = np.random.default_rng(1)
    B, n_ph = 2, 9
    ids = rng.integers(1, VOCAB, size=(B, n_ph))
    durs = rng.integers(1, 6, size=(B, n_ph))
    # equal frame totals per sample: ragged mel lengths hit the reference's
    # NaN-contamination path in padded decoder batches, which this framework
    # deliberately does not reproduce (see models/fastspeech2.py docstring)
    durs[1, -1] += durs[0].sum() - durs[1].sum()
    assert durs[1, -1] >= 1
    feats = {
        k: rng.standard_normal((B, n_ph)).astype(np.float32) * 0.5
        for k in ("pitch", "energy", "bright")
    }
    feats["breath"] = rng.uniform(0, 0.8, (B, n_ph)).astype(np.float32)
    feats["rough"] = rng.uniform(0, 1.5, (B, n_ph)).astype(np.float32)

    with torch.no_grad():
        t_out = twin(
            torch.tensor(ids), torch.tensor([n_ph] * B),
            targets={"durs": torch.tensor(durs), **{k: torch.tensor(v) for k, v in feats.items()}},
        )

    pad = lambda a: np.pad(a, ((0, 0), (0, cfg.max_phonemes - n_ph)))
    j_out = apply_fastspeech2(
        params, cfg, jnp.asarray(pad(ids).astype(np.int32)), jnp.asarray([n_ph] * B),
        target_durations=jnp.asarray(pad(durs).astype(np.float32)),
        target_pitch=jnp.asarray(pad(feats["pitch"])),
        target_energy=jnp.asarray(pad(feats["energy"])),
        target_breath=jnp.asarray(pad(feats["breath"])),
        target_rough=jnp.asarray(pad(feats["rough"])),
        target_bright=jnp.asarray(pad(feats["bright"])),
    )
    for b in range(B):
        L = int(t_out["mel_len"][b])
        mel_t = t_out["mel"][b, :L].numpy()
        mel_j = np.asarray(j_out["mel_pred"])[b, :L]
        assert np.abs(mel_t - mel_j).mean() < 1e-4


def test_fused_predictors_match_sequential():
    """The vmapped stacked-predictor pass must equal the sequential path
    bitwise — same outputs AND same dropout keys consumed per predictor
    (training mode with a live rng)."""
    import dataclasses

    from spev_tpu.models.fastspeech2 import init_fastspeech2

    cfg = ModelConfig(vocab_size=30, embed_dim=32, hidden_dim=32, n_mels=20,
                      max_phonemes=16, max_frames=64, use_nasality=True)
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    ids = rng.integers(1, 30, (2, 16)).astype(np.int32)
    lens = jnp.asarray([16, 11])
    durs = jnp.asarray(np.full((2, 16), 3, np.float32))
    tgts = dict(
        target_durations=durs,
        target_pitch=jnp.zeros((2, 16)), target_energy=jnp.zeros((2, 16)),
        target_breath=jnp.zeros((2, 16)), target_rough=jnp.zeros((2, 16)),
        target_bright=jnp.zeros((2, 16)), target_nasal=jnp.zeros((2, 16)),
    )
    cfg_seq = dataclasses.replace(cfg, fused_predictors=False)
    for drop_rng in (None, jax.random.PRNGKey(7)):
        det = drop_rng is None
        out_f = apply_fastspeech2(params, cfg, jnp.asarray(ids), lens,
                                  dropout_rng=drop_rng, deterministic=det, **tgts)
        out_s = apply_fastspeech2(params, cfg_seq, jnp.asarray(ids), lens,
                                  dropout_rng=drop_rng, deterministic=det, **tgts)
        for k in ("log_duration_pred", "pitch_pred", "energy_pred",
                  "bright_pred", "breath_pred", "rough_pred", "nasal_pred",
                  "mel_pred"):
            a, b = np.asarray(out_f[k]), np.asarray(out_s[k])
            assert np.array_equal(a, b), (k, np.abs(a - b).max())
