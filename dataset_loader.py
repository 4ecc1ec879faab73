"""Reference-compatible module name (``setup.py:76`` lists
``dataset_loader`` in py_modules; the file never shipped in the snapshot).

Re-exports the dataset/cache layer so ``import dataset_loader`` works for
reference users: `SpevDataset` (two-pass feature cache), `BucketBatcher`,
and the reference-cache importers."""

from spev_tpu.data.batching import BucketBatcher, train_val_split
from spev_tpu.data.cache_import import import_monolithic_cache, import_reference_cache
from spev_tpu.data.dataset import SpevDataset

__all__ = ["SpevDataset", "BucketBatcher", "train_val_split",
           "import_reference_cache", "import_monolithic_cache"]
