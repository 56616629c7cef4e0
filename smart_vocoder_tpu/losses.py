"""GAN / reconstruction losses (L6, reference losses.py).

All losses compute in float32 regardless of model compute dtype, mirroring the
reference's fp32 autocast islands (train.py:189, :201; losses.py casts every
input with ``.float()``).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp


def _f32(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.float32)


def discriminator_loss(
    disc_real_outputs: Sequence[jnp.ndarray],
    disc_generated_outputs: Sequence[jnp.ndarray],
) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
    """LSGAN D loss: sum_d mean((1-D(y))^2) + mean(D(y_hat)^2)
    (ref: losses.py:18-31). Also returns per-discriminator scalars for TB."""
    loss = jnp.float32(0.0)
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r_loss = jnp.mean((1.0 - _f32(dr)) ** 2)
        g_loss = jnp.mean(_f32(dg) ** 2)
        loss = loss + r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(
    disc_outputs: Sequence[jnp.ndarray],
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """LSGAN G loss: sum_d mean((1-D(y_hat))^2) (ref: losses.py:34-43)."""
    loss = jnp.float32(0.0)
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - _f32(dg)) ** 2)
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    """2 * sum over discriminators/layers of mean |fmap_r - fmap_g|
    (ref: losses.py:7-15). Real feature maps are treated as constants by the
    caller (they do not depend on generator params)."""
    loss = jnp.float32(0.0)
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(_f32(rl) - _f32(gl)))
    return loss * 2.0


def kl_loss(
    z_p: jnp.ndarray,
    logs_q: jnp.ndarray,
    m_p: jnp.ndarray,
    logs_p: jnp.ndarray,
    z_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Masked KL between the flow-mapped posterior and the mel prior
    (ref: losses.py:46-61). Inputs are time-major (B, T, H); mask (B, T, 1)."""
    z_p, logs_q = _f32(z_p), _f32(logs_q)
    m_p, logs_p = _f32(m_p), _f32(logs_p)
    z_mask = _f32(z_mask)

    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    kl = jnp.sum(kl * z_mask)
    return kl / jnp.sum(z_mask)


def mel_l1_loss(y_mel: jnp.ndarray, y_hat_mel: jnp.ndarray) -> jnp.ndarray:
    """L1 mel reconstruction term (ref: train.py:202 F.l1_loss)."""
    return jnp.mean(jnp.abs(_f32(y_mel) - _f32(y_hat_mel)))
