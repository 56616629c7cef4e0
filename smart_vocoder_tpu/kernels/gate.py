"""Fused add-tanh-sigmoid gate as a Pallas TPU kernel.

The reference fuses this with torch.jit (commons.py:100-107); under XLA it
already fuses into the producing conv's epilogue, so this kernel exists as
the minimal Pallas surface (and a fallback for fusion-hostile contexts), with
the same semantics: ``tanh(x[.., :H] + g[.., :H]) * sigmoid(x[.., H:] + g[.., H:])``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gate_kernel(x_ref, g_ref, out_ref):
    h = out_ref.shape[-1]
    act = x_ref[...] + g_ref[...]
    out_ref[...] = jnp.tanh(act[..., :h]) * jax.nn.sigmoid(act[..., h:])


def fused_gate(x: jnp.ndarray, g: jnp.ndarray | None = None,
               interpret: bool = False) -> jnp.ndarray:
    """x (..., 2H) [+ g broadcastable] -> tanh(a) * sigmoid(b), (..., H)."""
    if g is None:
        g = jnp.zeros((), x.dtype)
    g = jnp.broadcast_to(g, x.shape).astype(x.dtype)
    h = x.shape[-1] // 2
    out_shape = x.shape[:-1] + (h,)
    return pl.pallas_call(
        _gate_kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, g)
