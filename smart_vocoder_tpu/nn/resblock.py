"""HiFi-GAN multi-receptive-field ResBlocks (reference modules.py:187-256)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from smart_vocoder_tpu.nn.conv import LRELU_SLOPE, NormConv1d


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    """Same-length padding for odd kernels (ref: commons.py:14-15)."""
    return int((kernel_size * dilation - dilation) / 2)


class ResBlock1(nn.Module):
    """3x (lrelu -> dilated conv -> lrelu -> conv) residual block
    (ref: modules.py:187-229). The 'MRF' block of HiFi-GAN V1."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    pack: int = 1  # space-to-depth factor for MXU lane occupancy (exact)
    dtype: jnp.dtype = jnp.float32
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        for j, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = NormConv1d(
                self.channels, self.kernel_size, padding=_get_padding(self.kernel_size, d),
                dilation=d, weight_norm=self.weight_norm, pack=self.pack,
                dtype=self.dtype, name=f"convs1_{j}",
            )(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = NormConv1d(
                self.channels, self.kernel_size, padding=_get_padding(self.kernel_size, 1),
                dilation=1, weight_norm=self.weight_norm, pack=self.pack,
                dtype=self.dtype, name=f"convs2_{j}",
            )(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


class ResBlock2(nn.Module):
    """2x (lrelu -> dilated conv) residual block (ref: modules.py:232-256)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3)
    pack: int = 1
    dtype: jnp.dtype = jnp.float32
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        for j, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = NormConv1d(
                self.channels, self.kernel_size, padding=_get_padding(self.kernel_size, d),
                dilation=d, weight_norm=self.weight_norm, pack=self.pack,
                dtype=self.dtype, name=f"convs_{j}",
            )(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x
