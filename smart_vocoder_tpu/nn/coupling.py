"""Residual-coupling flow step + channel flip (reference modules.py:270-343).

The flow maps posterior latents into the prior space during training and runs
in reverse at inference (models.py:73-80). Coupling layers here are mean-only
(logs == 0, models.py:70) but the general affine path is kept for capability
parity.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from smart_vocoder_tpu.nn.conv import NormConv1d
from smart_vocoder_tpu.nn.wn import WN


def flip_channels(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse the channel axis -- the Flip flow permutation, its own inverse,
    logdet 0 (ref: modules.py:270-277)."""
    return x[..., ::-1]


class ResidualCouplingLayer(nn.Module):
    """Affine coupling: transform half the channels conditioned on the other
    half through a WN stack (ref: modules.py:298-343).

    forward: ``x1 = m + x1 * exp(logs)``; reverse: ``x1 = (x1 - m) * exp(-logs)``.
    The ``post`` projection is zero-initialized (modules.py:321-322) so the
    flow starts as the identity.
    """

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    mean_only: bool = True
    dtype: jnp.dtype = jnp.float32
    weight_norm: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        g: jnp.ndarray | None = None,
        reverse: bool = False,
    ):
        assert self.channels % 2 == 0, "channels should be divisible by 2"
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]

        h = NormConv1d(self.hidden_channels, 1, dtype=self.dtype, name="pre")(x0) * x_mask
        h = WN(
            self.hidden_channels, self.kernel_size, self.dilation_rate, self.n_layers,
            gin_channels=self.gin_channels, dtype=self.dtype,
            weight_norm=self.weight_norm, name="enc",
        )(h, x_mask, g=g)
        stats = NormConv1d(
            half * (2 - int(self.mean_only)), 1, zero_init=True, dtype=self.dtype, name="post",
        )(h) * x_mask

        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = stats[..., :half], stats[..., half:]

        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)
