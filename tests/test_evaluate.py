"""Checkpoint quality evaluation (`infer/evaluate.py`, `spev-eval` CLI) —
the corpus-wide measurement surface for the reference's documented
targets (``PRODUCTION_SYSTEM_SUMMARY.md:227-231``)."""

import json
import os

import numpy as np
import pytest

from spev_tpu.config import ModelConfig, SpevConfig, TrainConfig
from spev_tpu.data.dataset import SpevDataset
from spev_tpu.text.vocab import Vocab
from spev_tpu.train.trainer import Trainer
from tests.test_data import _make_corpus


@pytest.fixture(scope="module")
def corpus_ckpt(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    cache = str(tmp_path_factory.mktemp("cache"))
    work = str(tmp_path_factory.mktemp("work"))
    _make_corpus(root, n=5, seconds=0.7)
    ds = SpevDataset(root, cache_dir=cache, g2p_backend="rules", stats_sample=5)
    vocab = Vocab(ds.vocab)
    cfg = SpevConfig(
        model=ModelConfig(vocab_size=len(vocab), embed_dim=32, hidden_dim=32,
                          n_mels=80, max_phonemes=64, max_frames=128),
        train=TrainConfig(batch_size=2, warmup_steps=5, epochs=1),
    )
    trainer = Trainer(cfg, vocab, ds.stats,
                      ckpt_dir=os.path.join(work, "ck"),
                      log_dir=os.path.join(work, "logs"))
    ckpt = trainer.save("eval_test")
    return root, cache, ds, ckpt


def test_evaluate_checkpoint_per_utterance_and_aggregate(corpus_ckpt):
    from spev_tpu.infer.evaluate import evaluate_checkpoint

    root, cache, ds, ckpt = corpus_ckpt
    res = evaluate_checkpoint(ckpt, ds, batch_size=2,
                              phoneme_buckets=(64,), frame_buckets=(128,))
    per, agg = res["per_utterance"], res["aggregate"]
    assert set(per) == set(range(len(ds)))
    for v in per.values():
        assert np.isfinite(v["mcd_db"]) and v["mcd_db"] > 0
        assert np.isfinite(v["dur_err_pct"]) and v["dur_err_pct"] >= 0
        assert v["frames"] > 0
        # tone corpus: every utterance has voiced phonemes -> F0 RMSE in a
        # plausible Hz band (denormalized via the checkpoint stats)
        assert 0 < v["f0_rmse_hz"] < 500
    assert agg["n_utterances"] == len(ds) and agg["n_skipped"] == 0
    mcds = sorted(v["mcd_db"] for v in per.values())
    assert agg["mcd_db_median"] == pytest.approx(mcds[len(mcds) // 2], abs=1e-3)
    # an untrained model cannot meet the reference targets
    assert agg["meets_mcd_target_6db"] is False


def test_evaluate_respects_indices_and_skips_overlong(corpus_ckpt):
    from spev_tpu.infer.evaluate import evaluate_checkpoint

    root, cache, ds, ckpt = corpus_ckpt
    res = evaluate_checkpoint(ckpt, ds, indices=[0, 2], batch_size=2,
                              phoneme_buckets=(64,), frame_buckets=(128,))
    assert set(res["per_utterance"]) == {0, 2}
    res2 = evaluate_checkpoint(ckpt, ds, batch_size=2,
                               phoneme_buckets=(64,), frame_buckets=(8,))
    assert res2["per_utterance"] == {} and len(res2["skipped"]) == len(ds)


def test_eval_cli_json_and_split(corpus_ckpt, tmp_path, capsys):
    from spev_tpu.cli.evaluate import main

    root, cache, ds, ckpt = corpus_ckpt
    out = str(tmp_path / "eval.json")
    main(["--checkpoint", ckpt, "--data_dir", root, "--cache_dir", cache,
          "--split", "all", "--batch_size", "2", "--json", out])
    printed = capsys.readouterr().out
    assert "MCD:" in printed and "duration error:" in printed
    with open(out) as f:
        res = json.load(f)
    assert res["aggregate"]["n_utterances"] == len(ds)
    # val split: the 95/5 split of 5 utterances -> 1 val utterance
    main(["--checkpoint", ckpt, "--data_dir", root, "--cache_dir", cache,
          "--split", "val", "--batch_size", "2"])
    assert "evaluated 1 utterances" in capsys.readouterr().out


def test_evaluate_with_vocoder_scores_serving_condition(corpus_ckpt):
    """vocoder= adds vocoded_mcd_db per utterance (vocode the predicted
    mel, re-extract, MCD vs gt mel) + the serving-condition aggregate."""
    import jax

    from spev_tpu.infer.evaluate import evaluate_checkpoint
    from spev_tpu.infer.vocoder import Vocoder
    from spev_tpu.models.hifigan import (
        HiFiGANConfig,
        HiFiGANGenerator,
        init_hifigan,
    )

    tiny = HiFiGANConfig(
        resblock="2", upsample_rates=(8, 8, 4), upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), num_mels=80,
    )
    voc = Vocoder(generator=HiFiGANGenerator(
        tiny, init_hifigan(jax.random.PRNGKey(0), tiny)),
        frame_buckets=(128,))

    root, cache, ds, ckpt = corpus_ckpt
    res = evaluate_checkpoint(ckpt, ds, indices=[0, 1], batch_size=2,
                              phoneme_buckets=(64,), frame_buckets=(128,),
                              vocoder=voc)
    per, agg = res["per_utterance"], res["aggregate"]
    for v in per.values():
        assert np.isfinite(v["vocoded_mcd_db"]) and v["vocoded_mcd_db"] > 0
    assert "vocoded_mcd_db_mean" in agg
    # a random generator is far from the target
    assert agg["meets_vocoded_mcd_target_6db"] is False
