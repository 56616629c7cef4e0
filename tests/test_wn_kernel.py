"""Fused WN stack kernel parity vs the flax nn.WN module (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_vocoder_tpu.kernels.wn_stack import fused_wn_stack, wn_layers_from_params
from smart_vocoder_tpu.nn import WN
from smart_vocoder_tpu.ops import sequence_mask


@pytest.mark.parametrize("n_layers,layers_per_call", [(4, 4), (6, 3), (8, 4)])
def test_fused_wn_matches_module(n_layers, layers_per_call):
    hidden, t, b = 192, 64, 2
    mod = WN(hidden, 5, 1, n_layers, weight_norm=False)
    x = jax.random.normal(jax.random.key(0), (b, t, hidden)) * 0.3
    lengths = jnp.array([t, t - 10])
    mask = sequence_mask(lengths, t).astype(x.dtype)
    x = x * mask
    params = mod.init(jax.random.key(1), x, mask)["params"]
    want = mod.apply({"params": params}, x, mask)

    layers = wn_layers_from_params(params, n_layers)
    got = fused_wn_stack(x, mask, layers, hidden,
                         layers_per_call=layers_per_call, tile=16, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fused_wn_tile_invariance():
    hidden, t = 192, 96
    mod = WN(hidden, 5, 1, 4, weight_norm=False)
    x = jax.random.normal(jax.random.key(2), (1, t, hidden)) * 0.3
    mask = jnp.ones((1, t, 1))
    params = mod.init(jax.random.key(3), x, mask)["params"]
    layers = wn_layers_from_params(params, 4)
    a = fused_wn_stack(x, mask, layers, hidden, tile=8, interpret=True)
    c = fused_wn_stack(x, mask, layers, hidden, tile=48, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-5)
