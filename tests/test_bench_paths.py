"""bench.py code paths that must not break the driver artifact — executed
at tiny configuration on CPU."""

import numpy as np
import pytest

from spev_tpu.config import ModelConfig
from spev_tpu.models.hifigan import HiFiGANConfig


@pytest.mark.slow
def test_measure_adaptive_serving_tiny():
    from bench import measure_adaptive_serving

    cfg = ModelConfig(vocab_size=32, embed_dim=32, hidden_dim=32, n_mels=8)
    vcfg = HiFiGANConfig(
        resblock="2", upsample_rates=(8, 8, 4), upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), num_mels=8,
    )
    rtf = measure_adaptive_serving(
        n_requests=6, B=3, model_cfg=cfg, voc_cfg=vcfg,
        frame_buckets=(64, 128), phoneme_buckets=(64,),
    )
    assert np.isfinite(rtf) and rtf > 0
