"""HiFi-GAN generator parity vs a torch twin (weight-normed checkpoint →
fold → JAX graph), covering both ResBlock variants and conv-transpose
semantics (SURVEY.md §7 hard part #2)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF
from torch.nn.utils import weight_norm

import jax
import jax.numpy as jnp

from spev_tpu.models.hifigan import (
    HiFiGANConfig,
    HiFiGANGenerator,
    apply_hifigan,
    conv_transpose1d,
    hifigan_params_from_state_dict,
)

SLOPE = 0.1


def _pad(k, d=1):
    return (k * d - d) // 2


class TRes1(tnn.Module):
    def __init__(self, ch, k, dil):
        super().__init__()
        self.convs1 = tnn.ModuleList(
            weight_norm(tnn.Conv1d(ch, ch, k, dilation=d, padding=_pad(k, d))) for d in dil
        )
        self.convs2 = tnn.ModuleList(
            weight_norm(tnn.Conv1d(ch, ch, k, dilation=1, padding=_pad(k))) for _ in dil
        )

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c2(tF.leaky_relu(c1(tF.leaky_relu(x, SLOPE)), SLOPE))
            x = x + xt
        return x


class TRes2(tnn.Module):
    def __init__(self, ch, k, dil):
        super().__init__()
        self.convs = tnn.ModuleList(
            weight_norm(tnn.Conv1d(ch, ch, k, dilation=d, padding=_pad(k, d))) for d in dil
        )

    def forward(self, x):
        for c in self.convs:
            x = x + c(tF.leaky_relu(x, SLOPE))
        return x


class TGen(tnn.Module):
    def __init__(self, cfg: HiFiGANConfig):
        super().__init__()
        self.cfg = cfg
        self.conv_pre = weight_norm(tnn.Conv1d(cfg.num_mels, cfg.upsample_initial_channel, 7, padding=3))
        self.ups = tnn.ModuleList()
        self.resblocks = tnn.ModuleList()
        ch = cfg.upsample_initial_channel
        Res = TRes1 if cfg.resblock == "1" else TRes2
        for u, k in zip(cfg.upsample_rates, cfg.upsample_kernel_sizes):
            self.ups.append(
                weight_norm(tnn.ConvTranspose1d(ch, ch // 2, k, stride=u, padding=(k - u) // 2))
            )
            ch //= 2
            for kr, dil in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                self.resblocks.append(Res(ch, kr, dil))
        self.conv_post = weight_norm(tnn.Conv1d(ch, 1, 7, padding=3))

    def forward(self, mel):
        x = self.conv_pre(mel)
        nk = len(self.cfg.resblock_kernel_sizes)
        for i in range(len(self.cfg.upsample_rates)):
            x = tF.leaky_relu(x, SLOPE)
            x = self.ups[i](x)
            xs = None
            for j in range(nk):
                out = self.resblocks[i * nk + j](x)
                xs = out if xs is None else xs + out
            x = xs / nk
        x = tF.leaky_relu(x)
        return torch.tanh(self.conv_post(x)).squeeze(1)


def _tiny_cfg(resblock):
    return HiFiGANConfig(
        resblock=resblock,
        upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 3)) if resblock == "1" else ((1, 2), (2, 6)),
        num_mels=8,
    )


def test_conv_transpose_matches_torch():
    torch.manual_seed(0)
    for in_ch, out_ch, k, u in [(8, 4, 16, 8), (6, 3, 8, 4), (4, 2, 4, 2)]:
        tconv = tnn.ConvTranspose1d(in_ch, out_ch, k, stride=u, padding=(k - u) // 2)
        x = torch.randn(2, in_ch, 17)
        with torch.no_grad():
            ref = tconv(x).numpy().transpose(0, 2, 1)
        p = {"weight": jnp.asarray(tconv.weight.detach().numpy()),
             "bias": jnp.asarray(tconv.bias.detach().numpy())}
        ours = np.asarray(conv_transpose1d(p, jnp.asarray(x.numpy().transpose(0, 2, 1)), u))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("resblock", ["1", "2"])
def test_generator_parity(resblock):
    torch.manual_seed(1)
    cfg = _tiny_cfg(resblock)
    tg = TGen(cfg).eval()
    sd = {k: v.numpy() for k, v in tg.state_dict().items()}
    params = jax.tree.map(jnp.asarray, hifigan_params_from_state_dict(sd, cfg))

    mel = torch.randn(2, cfg.num_mels, 23)
    with torch.no_grad():
        ref = tg(mel).numpy()
    ours = np.asarray(apply_hifigan(params, cfg, jnp.asarray(mel.numpy().transpose(0, 2, 1))))
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).mean() < 1e-5


def test_from_pretrained_directory(tmp_path):
    torch.manual_seed(2)
    cfg = _tiny_cfg("2")
    tg = TGen(cfg).eval()
    cfg_json = {
        "resblock": cfg.resblock,
        "upsample_rates": list(cfg.upsample_rates),
        "upsample_kernel_sizes": list(cfg.upsample_kernel_sizes),
        "upsample_initial_channel": cfg.upsample_initial_channel,
        "resblock_kernel_sizes": list(cfg.resblock_kernel_sizes),
        "resblock_dilation_sizes": [list(d) for d in cfg.resblock_dilation_sizes],
        "num_mels": cfg.num_mels,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg_json))
    torch.save({"generator": tg.state_dict()}, str(tmp_path / "g_00000042"))

    gen = HiFiGANGenerator.from_pretrained(str(tmp_path))
    mel = torch.randn(1, cfg.num_mels, 19)
    with torch.no_grad():
        ref = tg(mel).numpy()
    ours = np.asarray(gen(jnp.asarray(mel.numpy().transpose(0, 2, 1))))
    assert np.abs(ours - ref).mean() < 1e-5
