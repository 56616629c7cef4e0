"""WN: the WaveNet-style gated dilated-conv stack (reference modules.py:111-184).

This is THE hot kernel of the model: 16 layers in each of the mel encoder and
posterior encoder plus 8 in each of the 4 coupling layers = 64 WN layers per
generator step, all over full-length sequences (SURVEY.md section 2.1).

Per layer: weight-normed dilated conv ``H -> 2H`` -> add speaker conditioning
slice -> ``tanh(a) * sigmoid(b)`` gate -> 1x1 res/skip conv; the residual half
feeds the next layer, skip halves are summed into the output. Speaker
conditioning comes from ONE big 1x1 ``cond_layer`` producing ``2*H*n_layers``
channels, sliced per layer (modules.py:126-128, :157-159) -- kept identical so
reference checkpoints (which contain cond_layer params even though the
reference always passes g=None) load exactly.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from smart_vocoder_tpu.nn.conv import NormConv1d


def gated_activation(x: jnp.ndarray, g: jnp.ndarray | None = None) -> jnp.ndarray:
    """``tanh(x[..:H]) * sigmoid(x[..H:])`` with optional additive conditioning.

    The reference's ``fused_add_tanh_sigmoid_multiply`` torch.jit fusion
    (commons.py:100-107); under XLA this fuses into the producing conv's
    epilogue automatically.
    """
    if g is not None:
        x = x + g
    h = x.shape[-1] // 2
    return jnp.tanh(x[..., :h]) * nn.sigmoid(x[..., h:])


class WN(nn.Module):
    """Gated dilated-conv stack (ref: modules.py:111-184).

    Args mirror the reference; ``p_dropout`` is omitted because every
    instantiation in the executed graph uses 0 (models.py:305-314).
    """

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    dtype: jnp.dtype = jnp.float32
    weight_norm: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        g: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """x: (B, T, H); x_mask: (B, T, 1); g: (B, 1, gin) or (B, T, gin) or None."""
        h = self.hidden_channels
        output = jnp.zeros_like(x)

        if g is not None:
            if self.gin_channels == 0:
                raise ValueError("speaker conditioning passed but gin_channels == 0")
            g = NormConv1d(
                2 * h * self.n_layers, 1, weight_norm=self.weight_norm,
                dtype=self.dtype, name="cond_layer",
            )(g)

        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            padding = int((self.kernel_size * dilation - dilation) / 2)
            x_in = NormConv1d(
                2 * h, self.kernel_size, padding=padding, dilation=dilation,
                weight_norm=self.weight_norm, dtype=self.dtype, name=f"in_layers_{i}",
            )(x)

            g_l = None
            if g is not None:
                g_l = g[..., i * 2 * h : (i + 1) * 2 * h]
            acts = gated_activation(x_in, g_l)

            # Last layer needs no residual half (modules.py:138-142).
            res_skip_channels = 2 * h if i < self.n_layers - 1 else h
            res_skip = NormConv1d(
                res_skip_channels, 1, weight_norm=self.weight_norm,
                dtype=self.dtype, name=f"res_skip_layers_{i}",
            )(acts)

            if i < self.n_layers - 1:
                x = (x + res_skip[..., :h]) * x_mask
                output = output + res_skip[..., h:]
            else:
                output = output + res_skip
        return output * x_mask
