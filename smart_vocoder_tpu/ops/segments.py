"""Masking and segment-slicing tensor utilities (L2).

Time-major layout: activations are ``(batch, time, channels)`` and masks are
``(batch, time, 1)`` (the reference is channel-major, commons.py).

Random segment slicing is the reference's length-decoupling trick: only a
fixed-size window of the latent is decoded during training so generator /
discriminator cost is independent of utterance length (commons.py:48-64,
train.py:154-166). Fixed window + traced offset = static shapes under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """``(B,) lengths -> (B, max_length, 1)`` float mask (ref: commons.py:121-125)."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    mask = pos[None, :] < lengths[:, None]
    return mask[..., None]


def slice_segments(x: jnp.ndarray, ids_str: jnp.ndarray, segment_size: int) -> jnp.ndarray:
    """Gather per-sample windows ``x[i, ids_str[i] : ids_str[i]+segment_size]``.

    ``x`` is ``(B, T, C)``; returns ``(B, segment_size, C)``. Equivalent to the
    reference's python loop (commons.py:48-54) as a vmapped dynamic_slice --
    one fused gather under jit instead of B separate copies.
    """
    def take(xi, start):
        return jax.lax.dynamic_slice_in_dim(xi, start, segment_size, axis=0)

    return jax.vmap(take)(x, ids_str)


def rand_slice_segments(
    rng: jax.Array,
    x: jnp.ndarray,
    x_lengths: jnp.ndarray | None,
    segment_size: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Random fixed-size windows + their offsets (ref: commons.py:57-64).

    Offsets are uniform over ``[0, length - segment_size]`` per sample, with
    explicit PRNG (the reference uses unseeded ``torch.rand``, commons.py:62).
    """
    b, t, _ = x.shape
    if x_lengths is None:
        x_lengths = jnp.full((b,), t, dtype=jnp.int32)
    ids_str_max = x_lengths - segment_size + 1
    u = jax.random.uniform(rng, (b,), dtype=jnp.float32)
    ids_str = (u * ids_str_max.astype(jnp.float32)).astype(jnp.int32)
    return slice_segments(x, ids_str, segment_size), ids_str
