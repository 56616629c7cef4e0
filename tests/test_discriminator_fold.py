"""DiscriminatorP period-folding (fold_period=True) exactness vs the direct
2-D NHWC evaluation: same params, same logits (reference flatten order), same
fmap elements, same parameter gradients. The fold is a pure layout change --
a (k, 1) kernel never mixes the period axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_vocoder_tpu.losses import discriminator_loss, feature_loss
from smart_vocoder_tpu.models.discriminator import (
    DiscriminatorP,
    MultiPeriodDiscriminator,
)


@pytest.mark.parametrize("period", [2, 3, 5, 11])
def test_fold_period_exact(period):
    b, t = 2, 1024
    x = jax.random.normal(jax.random.key(0), (b, t, 1)) * 0.3
    ref = DiscriminatorP(period, width_mult=0.25, fold_period=False)
    params = ref.init(jax.random.key(1), x)["params"]
    fold = DiscriminatorP(period, width_mult=0.25, fold_period=True)

    logits_r, fmaps_r = ref.apply({"params": params}, x)
    logits_f, fmaps_f = fold.apply({"params": params}, x)

    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_r),
                               rtol=1e-5, atol=1e-5)
    assert len(fmaps_f) == len(fmaps_r)
    for ff, fr in zip(fmaps_f, fmaps_r):
        # folded layout (B, p, H, C) vs reference (B, H, p, C)
        np.testing.assert_allclose(np.asarray(ff.transpose(0, 2, 1, 3)),
                                   np.asarray(fr), rtol=1e-5, atol=1e-5)


def test_fold_period_grads_exact():
    b, t, period = 2, 512, 3
    x = jax.random.normal(jax.random.key(2), (b, t, 1)) * 0.3
    ref = DiscriminatorP(period, width_mult=0.25, fold_period=False)
    params = ref.init(jax.random.key(3), x)["params"]
    fold = DiscriminatorP(period, width_mult=0.25, fold_period=True)

    def loss(mod):
        def f(p, x):
            logits, fmaps = mod.apply({"params": p}, x)
            return jnp.mean(logits ** 2) + sum(jnp.mean(jnp.abs(f)) for f in fmaps)
        return f

    gr = jax.grad(loss(ref))(params, x)
    gf = jax.grad(loss(fold))(params, x)
    for pr, pf in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pr),
                                   rtol=2e-5, atol=2e-6)


def test_mpd_fold_matches_unfold_losses():
    """End-to-end through the ensemble + GAN losses: identical values."""
    b, t = 2, 2048
    y = jax.random.normal(jax.random.key(4), (b, t, 1)) * 0.3
    y_hat = jax.random.normal(jax.random.key(5), (b, t, 1)) * 0.3

    ref = MultiPeriodDiscriminator(width_mult=0.125, fold_period=False)
    params = ref.init(jax.random.key(6), y, y_hat)["params"]
    fold = MultiPeriodDiscriminator(width_mult=0.125, fold_period=True)

    def losses(mod):
        r, g, fr, fg = mod.apply({"params": params}, y, y_hat)
        ld, _, _ = discriminator_loss(r, g)
        return float(ld), float(feature_loss(fr, fg))

    ld_r, fm_r = losses(ref)
    ld_f, fm_f = losses(fold)
    assert np.isclose(ld_f, ld_r, rtol=1e-5), (ld_f, ld_r)
    assert np.isclose(fm_f, fm_r, rtol=1e-5), (fm_f, fm_r)
