"""NN building blocks (L3): weight-normed convolutions, the WN gated
dilated-conv stack, HiFi-GAN MRF ResBlocks, and residual-coupling flow steps.

All modules are time-major ``(batch, time, channels)`` flax.linen modules.
Parameters are stored in the torch layout (see nn/conv.py) so reference
``G_*.pth`` / ``D_*.pth`` checkpoints map 1:1 onto the param pytree.
"""

from smart_vocoder_tpu.nn.conv import (
    LRELU_SLOPE,
    NormConv1d,
    NormConv2d,
    NormConvTranspose1d,
    fold_weight_norm,
)
from smart_vocoder_tpu.nn.wn import WN, gated_activation
from smart_vocoder_tpu.nn.resblock import ResBlock1, ResBlock2
from smart_vocoder_tpu.nn.coupling import ResidualCouplingLayer, flip_channels

__all__ = [
    "LRELU_SLOPE",
    "NormConv1d",
    "NormConv2d",
    "NormConvTranspose1d",
    "ResBlock1",
    "ResBlock2",
    "ResidualCouplingLayer",
    "WN",
    "flip_channels",
    "fold_weight_norm",
    "gated_activation",
]
