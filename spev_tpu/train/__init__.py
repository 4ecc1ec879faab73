"""spev_tpu.train — pjit trainer: masked losses, NaN policy, warmup,
two-phase schedule, checkpoints."""

from spev_tpu.train.loss import compute_losses
from spev_tpu.train.trainer import Trainer, TrainState, make_train_step

__all__ = ["compute_losses", "Trainer", "TrainState", "make_train_step"]
