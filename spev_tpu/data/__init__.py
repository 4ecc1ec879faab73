"""spev_tpu.data — dataset preparation, feature cache, bucketed batching.

Rebuilds the reference's data layer (SURVEY.md C5, C17, C18): dataset
downloaders/preppers produce ``{basename}.wav`` + ``{basename}.txt`` pairs;
the feature extractor runs a two-pass build (global stats, then per-utterance
features) into an npz cache + metadata.json; the batcher emits static-bucket
padded numpy batches ready for the pjit trainer.
"""

from spev_tpu.data.dataset import SpevDataset, FeatureExtractor
from spev_tpu.data.batching import BucketBatcher, collate

__all__ = ["SpevDataset", "FeatureExtractor", "BucketBatcher", "collate"]
