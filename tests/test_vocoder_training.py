"""HiFi-GAN adversarial training: discriminator shapes, loss composition,
a few update steps improve the mel reconstruction on a fixed batch."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spev_tpu.config import AudioConfig
from spev_tpu.models.hifigan import HiFiGANConfig, apply_hifigan, init_hifigan
from spev_tpu.models.hifigan_disc import (
    MPD_PERIODS,
    apply_discriminators,
    apply_period_disc,
    apply_scale_disc,
    init_discriminators,
    init_period_disc,
    init_scale_disc,
)
from spev_tpu.train.vocoder_trainer import (
    init_vocoder_train_state,
    make_vocoder_train_step,
)

TINY = HiFiGANConfig(
    resblock="2",
    upsample_rates=(8, 8, 4),
    upsample_kernel_sizes=(16, 16, 8),
    upsample_initial_channel=16,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),),
    num_mels=80,
)


def test_period_disc_shapes():
    p = init_period_disc(jax.random.PRNGKey(0), 3)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1024)).astype(np.float32))
    logits, feats = apply_period_disc(p, wav)
    assert logits.shape[0] == 2 and logits.shape[1] > 0
    assert len(feats) == 6  # 4 convs + 2 post


def test_scale_disc_shapes():
    p = init_scale_disc(jax.random.PRNGKey(1))
    wav = jnp.asarray(np.random.default_rng(1).standard_normal((2, 2048)).astype(np.float32))
    logits, feats = apply_scale_disc(p, wav)
    assert logits.shape[0] == 2 and len(feats) == 8


def test_combined_discriminators():
    params = init_discriminators(jax.random.PRNGKey(2), periods=(2, 3), n_scales=2)
    wav = jnp.asarray(np.random.default_rng(2).standard_normal((1, 2048)).astype(np.float32))
    outs = apply_discriminators(params, wav)
    assert len(outs) == 4  # 2 periods + 2 scales
    for logits, feats in outs:
        assert np.isfinite(np.asarray(logits)).all()


def test_bf16_disc_mode_trains_and_tracks_f32():
    """The --disc_dtype bf16 trainer mode: the step runs entirely with bf16
    discriminator weights/activations, master params and grads stay f32,
    the step stays finite, and first-step losses agree with the f32 graph
    to bf16 rounding tolerance (same init, same batch)."""
    audio = AudioConfig()
    hop = TINY.hop_recovery
    T = 16
    t = np.arange(T * hop) / audio.sample_rate
    wav = (0.4 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)[None]
    from spev_tpu.ops.stft import log_mel_spectrogram

    mel = np.asarray(
        log_mel_spectrogram(jnp.asarray(wav[0]), fmax=audio.sample_rate / 2)
    ).T[None, :T]

    def fresh_state():
        s = init_vocoder_train_state(jax.random.PRNGKey(0), TINY)
        s = s._replace(disc_params=init_discriminators(
            jax.random.PRNGKey(1), periods=(2,), n_scales=1))
        from spev_tpu.train.vocoder_trainer import make_vocoder_optimizer

        return s._replace(disc_opt=make_vocoder_optimizer().init(s.disc_params))

    _, m_f32 = make_vocoder_train_step(TINY, audio, periods=(2,))(
        fresh_state(), jnp.asarray(mel), jnp.asarray(wav))

    step = make_vocoder_train_step(TINY, audio, periods=(2,), disc_dtype="bf16")
    state = fresh_state()
    for _ in range(3):
        state, m = step(state, jnp.asarray(mel), jnp.asarray(wav))
        assert float(m["skipped"]) == 0.0
        assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))
    # master trees stay f32 through bf16-D updates
    for leaf in jax.tree.leaves(state.disc_params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(state.gen_params):
        assert leaf.dtype == jnp.float32
    # first-step losses track the f32 graph (bf16 rounding tolerance)
    state2, m2 = step(fresh_state(), jnp.asarray(mel), jnp.asarray(wav))
    for k in ("d_loss", "g_loss", "g_mel"):
        a, b = float(m2[k]), float(m_f32[k])
        assert abs(a - b) < 0.08 * max(1.0, abs(b)), (k, a, b)


@pytest.mark.slow
def test_vocoder_training_improves_mel():
    audio = AudioConfig()
    rng = np.random.default_rng(0)
    T = 24  # mel frames -> 6144 samples
    hop = TINY.hop_recovery
    t = np.arange(T * hop) / audio.sample_rate
    wav = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None]
    from spev_tpu.ops.stft import log_mel_spectrogram

    mel = np.asarray(
        log_mel_spectrogram(jnp.asarray(wav[0]), fmax=audio.sample_rate / 2)
    ).T[None, :T]

    # small discriminators for the smoke test
    state = init_vocoder_train_state(jax.random.PRNGKey(0), TINY)
    state = state._replace(
        disc_params=init_discriminators(jax.random.PRNGKey(1), periods=(2, 3), n_scales=2)
    )
    from spev_tpu.train.vocoder_trainer import make_vocoder_optimizer

    state = state._replace(disc_opt=make_vocoder_optimizer().init(state.disc_params))
    step = make_vocoder_train_step(TINY, audio)

    mels_l1 = []
    for i in range(4):
        state, m = step(state, jnp.asarray(mel), jnp.asarray(wav))
        assert float(m["skipped"]) == 0.0
        mels_l1.append(float(m["g_mel"]))
    assert int(state.step) == 4
    assert all(np.isfinite(v) for v in mels_l1)
    assert mels_l1[-1] < mels_l1[0]  # mel reconstruction improves


def test_vocoder_step_default_precision_trains():
    """The GAN step at 'default' (single-pass bf16) matmul precision — the
    fast vocoder-training mode (--precision default) — stays finite and
    improves mel reconstruction, and its losses start close to the
    parity-grade graph's (same init, same batch)."""
    from spev_tpu.models import modules

    audio = AudioConfig()
    hop = TINY.hop_recovery
    T = 16
    t = np.arange(T * hop) / audio.sample_rate
    wav = (0.4 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)[None]
    from spev_tpu.ops.stft import log_mel_spectrogram

    mel = np.asarray(
        log_mel_spectrogram(jnp.asarray(wav[0]), fmax=audio.sample_rate / 2)
    ).T[None, :T]

    def fresh_state():
        s = init_vocoder_train_state(jax.random.PRNGKey(0), TINY)
        s = s._replace(disc_params=init_discriminators(
            jax.random.PRNGKey(1), periods=(2,), n_scales=1))
        from spev_tpu.train.vocoder_trainer import make_vocoder_optimizer

        return s._replace(disc_opt=make_vocoder_optimizer().init(s.disc_params))

    modules.set_matmul_precision("high")
    _, m_high = make_vocoder_train_step(TINY, audio)(
        fresh_state(), jnp.asarray(mel), jnp.asarray(wav))

    modules.set_matmul_precision("default")
    step = make_vocoder_train_step(TINY, audio)
    state = fresh_state()
    mels_l1 = []
    for _ in range(4):
        state, m = step(state, jnp.asarray(mel), jnp.asarray(wav))
        assert float(m["skipped"]) == 0.0
        mels_l1.append(float(m["g_mel"]))
    assert all(np.isfinite(v) for v in mels_l1)
    assert mels_l1[-1] < mels_l1[0]
    # first-step losses agree with the parity graph to bf16 tolerance
    assert abs(mels_l1[0] - float(m_high["g_mel"])) < 0.05 * max(1.0, mels_l1[0])


@pytest.mark.slow
def test_vocoder_cli_end_to_end(tmp_path, monkeypatch):
    """spev-vocoder-train drives the full loop (wav glob -> prefetched
    random crops -> GAN steps -> gen_* checkpoint) on the tiny config."""
    import glob as _glob

    from spev_tpu.cli.vocoder import main
    from spev_tpu.utils.wavio import write_wav

    rng = np.random.default_rng(0)
    for i in range(2):
        y = 0.2 * np.sin(2 * np.pi * (150 + 40 * i) *
                         np.arange(22050) / 22050).astype(np.float32)
        y += 0.01 * rng.standard_normal(22050).astype(np.float32)
        write_wav(str(tmp_path / f"w{i}.wav"), y, 22050)
    monkeypatch.chdir(tmp_path)
    main(["--data_dir", str(tmp_path), "--name", "smoke", "--config", "tiny",
          "--steps", "2", "--batch_size", "2", "--segment_frames", "16",
          "--periods", "2", "--scales", "1", "--log_every", "1",
          "--save_every", "2"])
    ckpts = _glob.glob(str(tmp_path / "checkpoints" / "smoke" / "gen_*.spev"))
    assert len(ckpts) == 1, ckpts

    # resume from the trainer's OWN .spev output (found by use: only the
    # upstream dir form was accepted before)
    main(["--data_dir", str(tmp_path), "--name", "smoke2", "--config", "tiny",
          "--finetune_from", ckpts[0], "--disc_warmup", "1",
          "--steps", "2", "--batch_size", "2", "--segment_frames", "16",
          "--periods", "2", "--scales", "1", "--log_every", "1",
          "--save_every", "2"])
    ckpts2 = _glob.glob(str(tmp_path / "checkpoints" / "smoke2" / "gen_*.spev"))
    assert len(ckpts2) == 1, ckpts2


def test_full_state_save_load_roundtrip_resumes_exactly(tmp_path):
    """save_state/load_state: generator + discriminators + optimizer states
    + step round-trip exactly, so a resumed run's next update equals the
    uninterrupted run's (upstream's g_*+do_* resume semantics — a
    generator-only warm start restarts D and the LR schedule)."""
    from spev_tpu.train.vocoder_trainer import load_state, save_state

    audio = AudioConfig()
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 8, 80)).astype(np.float32) - 6.0)
    wav = jnp.asarray(rng.standard_normal((2, 8 * audio.hop_length)).astype(np.float32))

    state = init_vocoder_train_state(jax.random.PRNGKey(0), TINY,
                                     periods=(2,), n_scales=1)
    step = make_vocoder_train_step(TINY, audio, periods=(2,))
    state, _ = step(state, mel, wav)
    path = str(tmp_path / "state_latest.spev")
    save_state(path, state)
    step_before = int(state.step)

    # continue the original vs resume-from-disk: next step must match
    # (the train step donates its state arg, so read state only via the
    # saved file / step_before from here on)
    cont, m_cont = step(state, mel, wav)
    template = init_vocoder_train_state(jax.random.PRNGKey(1), TINY,
                                        periods=(2,), n_scales=1)
    resumed = load_state(path, template)
    assert int(resumed.step) == step_before
    res, m_res = step(resumed, mel, wav)
    assert float(m_cont["g_loss"]) == pytest.approx(float(m_res["g_loss"]), rel=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(cont.gen_params)[0]),
        np.asarray(jax.tree.leaves(res.gen_params)[0]), rtol=1e-6)
    # discriminators resumed too (not re-initialized)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(cont.disc_params)[0]),
        np.asarray(jax.tree.leaves(res.disc_params)[0]), rtol=1e-6)


def test_disc_warmup_freezes_generator():
    """step.d_step (the --disc_warmup path) updates ONLY the discriminators:
    the generator must come through bit-identical, so a warm-started
    generator (--finetune_from gen_*.spev) is untouched while fresh
    discriminators catch up to it."""
    audio = AudioConfig()
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 8, 80)).astype(np.float32) - 6.0)
    wav = jnp.asarray(rng.standard_normal((2, 8 * audio.hop_length)).astype(np.float32))

    state = init_vocoder_train_state(jax.random.PRNGKey(0), TINY,
                                     periods=(2,), n_scales=1)
    gen_before = jax.tree.map(np.array, state.gen_params)
    disc_leaf_before = np.array(jax.tree.leaves(state.disc_params)[0])
    step = make_vocoder_train_step(TINY, audio, periods=(2,))
    state, d_loss, ok = step.d_step(state, mel, wav)
    assert bool(ok) and np.isfinite(float(d_loss))
    for a, b in zip(jax.tree.leaves(gen_before), jax.tree.leaves(state.gen_params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert not np.allclose(disc_leaf_before,
                           np.asarray(jax.tree.leaves(state.disc_params)[0]))


def test_lr_threads_into_both_optimizers():
    """--lr reaches the update rule (it was parsed-but-ignored once):
    lr=0 must leave discriminator params unchanged after a d_step, while
    the default lr changes them on the same batch."""
    audio = AudioConfig()
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((2, 8, 80)).astype(np.float32) - 6.0)
    wav = jnp.asarray(rng.standard_normal((2, 8 * audio.hop_length)).astype(np.float32))

    def run(lr):
        state = init_vocoder_train_state(jax.random.PRNGKey(0), TINY,
                                         periods=(2,), n_scales=1, lr=lr)
        step = make_vocoder_train_step(TINY, audio, periods=(2,), lr=lr)
        before = np.array(jax.tree.leaves(state.disc_params)[0])
        state, _, _ = step.d_step(state, mel, wav)
        return before, np.asarray(jax.tree.leaves(state.disc_params)[0])

    b0, a0 = run(0.0)
    np.testing.assert_array_equal(b0, a0)
    b1, a1 = run(2e-4)
    assert not np.allclose(b1, a1)


def test_vocoder_step_data_parallel_matches_single_device():
    """GAN step over a 4-device 'data' mesh: crop batch sharded, state
    replicated, XLA's sharding-derived gradient all-reduce produces the
    same update as the single-device step on the same batch."""
    from spev_tpu.parallel.mesh import make_mesh

    audio = AudioConfig()
    rng = np.random.default_rng(2)
    B = 4
    mel = jnp.asarray(rng.standard_normal((B, 8, 80)).astype(np.float32) - 6.0)
    wav = jnp.asarray(rng.standard_normal((B, 8 * audio.hop_length)).astype(np.float32))

    def fresh():
        return init_vocoder_train_state(jax.random.PRNGKey(0), TINY,
                                        periods=(2,), n_scales=1)

    base_state, base_m = make_vocoder_train_step(TINY, audio, periods=(2,))(
        fresh(), mel, wav)

    mesh = make_mesh((4,), ("data",))
    step = make_vocoder_train_step(TINY, audio, periods=(2,), mesh=mesh)
    dp_state, dp_m = step(fresh(), mel, wav)

    assert float(dp_m["skipped"]) == 0.0
    assert float(base_m["g_loss"]) == pytest.approx(float(dp_m["g_loss"]), rel=1e-4)
    assert float(base_m["d_loss"]) == pytest.approx(float(dp_m["d_loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(base_state.gen_params),
                    jax.tree.leaves(dp_state.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    # the state really is replicated across all 4 devices
    leaf = jax.tree.leaves(dp_state.gen_params)[0]
    assert len(leaf.sharding.device_set) == 4
    assert leaf.sharding.is_fully_replicated


def test_fused_folded_step_matches_split_unfolded():
    """The fast training configuration (fused single-dispatch step +
    polyphase-folded generator with the traced differentiable fold) is the
    SAME optimization: first-step losses match the split/unfolded graph to
    float-rounding tolerance and the updated generator params agree."""
    audio = AudioConfig()
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((2, 8, 80)).astype(np.float32) - 6.0)
    wav = jnp.asarray(rng.standard_normal((2, 8 * audio.hop_length)).astype(np.float32))

    def fresh():
        return init_vocoder_train_state(jax.random.PRNGKey(0), TINY,
                                        periods=(2,), n_scales=1)

    base_state, base_m = make_vocoder_train_step(TINY, audio, periods=(2,))(
        fresh(), mel, wav)
    fast = make_vocoder_train_step(TINY, audio, periods=(2,),
                                   folded=True, fused=True)
    fast_state, fast_m = fast(fresh(), mel, wav)

    assert float(fast_m["skipped"]) == 0.0
    for k in ("d_loss", "g_loss", "g_mel", "g_fm", "g_adv"):
        assert float(base_m[k]) == pytest.approx(float(fast_m[k]), rel=2e-4), k
    for a, b in zip(jax.tree.leaves(base_state.gen_params),
                    jax.tree.leaves(fast_state.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)


@pytest.mark.slow
def test_fused_folded_training_improves_mel():
    """Multi-step trajectory through the fused+folded step stays finite,
    counts steps, and improves mel reconstruction (loss-trajectory
    equivalence evidence for the fast path)."""
    audio = AudioConfig()
    hop = TINY.hop_recovery
    T = 16
    t = np.arange(T * hop) / audio.sample_rate
    wav = (0.4 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)[None]
    from spev_tpu.ops.stft import log_mel_spectrogram

    mel = np.asarray(
        log_mel_spectrogram(jnp.asarray(wav[0]), fmax=audio.sample_rate / 2)
    ).T[None, :T]

    state = init_vocoder_train_state(jax.random.PRNGKey(0), TINY,
                                     periods=(2,), n_scales=1)
    step = make_vocoder_train_step(TINY, audio, periods=(2,),
                                   folded=True, fused=True)
    mels_l1 = []
    for _ in range(4):
        state, m = step(state, jnp.asarray(mel), jnp.asarray(wav))
        assert float(m["skipped"]) == 0.0
        mels_l1.append(float(m["g_mel"]))
    assert int(state.step) == 4
    assert all(np.isfinite(v) for v in mels_l1)
    assert mels_l1[-1] < mels_l1[0]
