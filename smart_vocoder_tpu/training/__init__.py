"""Training runtime (L7): optimizers, the jitted GAN train step, the loop."""

from smart_vocoder_tpu.training.optim import make_optimizer, lr_for_epoch, set_learning_rate
from smart_vocoder_tpu.training.step import Batch, TrainState, make_train_step

__all__ = [
    "Batch",
    "TrainState",
    "lr_for_epoch",
    "make_optimizer",
    "make_train_step",
    "set_learning_rate",
]
