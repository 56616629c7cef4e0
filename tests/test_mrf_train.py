"""Hand-VJP fused MRF training stage vs jax.vjp of the jnp mirror.

mrf_stage_train's backward must reproduce XLA autodiff of
mrf_stage_reference exactly (same math, f32 accumulation): dx, and dw/db for
all 3 branches x 3 pairs x 2 convs, on tile-interior, tile-boundary, and
ragged-length shapes (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_vocoder_tpu.kernels.mrf import mrf_stage_reference
from smart_vocoder_tpu.kernels.mrf_train import mrf_stage_train

KS = (3, 7, 11)
DILS = (1, 3, 5)


def _make_branches(rng, c, dtype=jnp.float32):
    branches = []
    for k in KS:
        w1 = jnp.asarray(rng.normal(0, 0.3, (3, k, c, c)), dtype)
        b1 = jnp.asarray(rng.normal(0, 0.1, (3, c)), dtype)
        w2 = jnp.asarray(rng.normal(0, 0.3, (3, k, c, c)), dtype)
        b2 = jnp.asarray(rng.normal(0, 0.1, (3, c)), dtype)
        branches.append((w1, b1, w2, b2))
    return branches


@pytest.mark.parametrize("t,tile", [(40, 16), (64, 32), (37, 16)])
def test_grads_match_autodiff(t, tile):
    rng = np.random.default_rng(0)
    c = 8
    x = jnp.asarray(rng.normal(0, 1, (2, t, c)), jnp.float32)
    branches = _make_branches(rng, c)
    g = jnp.asarray(rng.normal(0, 1, (2, t, c)), jnp.float32)

    ref_out, ref_vjp = jax.vjp(
        lambda x, br: mrf_stage_reference(x, br, KS, DILS), x, branches)
    ref_dx, ref_dbr = ref_vjp(g)

    out, vjp = jax.vjp(
        lambda x, br: mrf_stage_train(x, br, KS, DILS, tile, True), x, branches)
    dx, dbr = vjp(g)

    np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(dx, ref_dx, atol=2e-3, rtol=1e-3)
    for got, want in zip(dbr, ref_dbr):
        for a, b, name in zip(got, want, ("w1", "b1", "w2", "b2")):
            np.testing.assert_allclose(
                a, b, atol=2e-3, rtol=1e-3, err_msg=name)


def test_grad_through_loss_scalar():
    """value_and_grad through a scalar loss (the training-step usage shape)."""
    rng = np.random.default_rng(1)
    c = 8
    x = jnp.asarray(rng.normal(0, 1, (1, 32, c)), jnp.float32)
    branches = _make_branches(rng, c)

    def loss_k(x, br):
        return jnp.sum(jnp.abs(mrf_stage_train(x, br, KS, DILS, 16, True)))

    def loss_r(x, br):
        return jnp.sum(jnp.abs(mrf_stage_reference(x, br, KS, DILS)))

    (vk, gk) = jax.value_and_grad(loss_k, argnums=(0, 1))(x, branches)
    (vr, gr) = jax.value_and_grad(loss_r, argnums=(0, 1))(x, branches)
    np.testing.assert_allclose(vk, vr, rtol=1e-5)
    np.testing.assert_allclose(gk[0], gr[0], atol=2e-3, rtol=1e-3)
    flat_k = jax.tree.leaves(gk[1])
    flat_r = jax.tree.leaves(gr[1])
    for a, b in zip(flat_k, flat_r):
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


def test_bf16_grads_close():
    """bf16 activations (training compute dtype): grads land near the f32
    oracle within bf16 resolution."""
    rng = np.random.default_rng(2)
    c = 8
    x32 = jnp.asarray(rng.normal(0, 1, (2, 48, c)), jnp.float32)
    branches32 = _make_branches(rng, c)
    g32 = jnp.asarray(rng.normal(0, 1, (2, 48, c)), jnp.float32)

    _, ref_vjp = jax.vjp(
        lambda x, br: mrf_stage_reference(x, br, KS, DILS), x32, branches32)
    ref_dx, _ = ref_vjp(g32)

    x16 = x32.astype(jnp.bfloat16)
    branches16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), branches32)
    _, vjp = jax.vjp(
        lambda x, br: mrf_stage_train(x, br, KS, DILS, 16, True), x16, branches16)
    dx, dbr = vjp(g32.astype(jnp.bfloat16))
    assert dx.dtype == jnp.bfloat16
    assert jax.tree.leaves(dbr)[0].dtype == jnp.bfloat16

    # Apples to apples: XLA autodiff of the same math at the same bf16
    # operand dtype -- the kernel must not be LESS accurate than that path.
    _, ref16_vjp = jax.vjp(
        lambda x, br: mrf_stage_reference(x, br, KS, DILS), x16, branches16)
    ref16_dx, _ = ref16_vjp(g32.astype(jnp.bfloat16))
    err_kernel = float(jnp.max(jnp.abs(dx.astype(jnp.float32) - ref_dx)))
    err_xla16 = float(jnp.max(jnp.abs(ref16_dx.astype(jnp.float32) - ref_dx)))
    assert err_kernel <= 1.5 * err_xla16 + 1e-3, (err_kernel, err_xla16)
