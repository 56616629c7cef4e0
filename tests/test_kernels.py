"""Parity tests for the Pallas kernels (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_vocoder_tpu.kernels import (
    fused_gate,
    fused_mrf_stage,
    fused_mrf_stage_packed,
    mrf_stage_reference,
)
from smart_vocoder_tpu.kernels.mrf import stage_radius
from smart_vocoder_tpu.nn import gated_activation


class TestFusedGate:
    def test_matches_jnp_gate(self):
        x = jax.random.normal(jax.random.key(0), (2, 64, 32))
        g = jax.random.normal(jax.random.key(1), (2, 64, 32))
        want = gated_activation(x, g)
        got = fused_gate(x, g, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)

    def test_no_conditioning(self):
        x = jax.random.normal(jax.random.key(0), (4, 128, 16))
        want = gated_activation(x)
        got = fused_gate(x, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def make_branches(key, c, kernel_sizes):
    branches = []
    for k in kernel_sizes:
        keys = jax.random.split(key, 5)
        key = keys[0]
        w1 = jax.random.normal(keys[1], (3, k, c, c)) * 0.05
        b1 = jax.random.normal(keys[2], (3, c)) * 0.05
        w2 = jax.random.normal(keys[3], (3, k, c, c)) * 0.05
        b2 = jax.random.normal(keys[4], (3, c)) * 0.05
        branches.append((w1, b1, w2, b2))
    return branches


class TestFusedMRF:
    @pytest.mark.parametrize("c,ks", [(32, (3, 7, 11)), (64, (3, 7, 11))])
    def test_matches_reference(self, c, ks):
        x = jax.random.normal(jax.random.key(0), (2, 300, c)) * 0.3
        branches = make_branches(jax.random.key(1), c, ks)
        want = mrf_stage_reference(x, branches, ks)
        got = fused_mrf_stage(x, branches, ks, tile=128, interpret=True)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    def test_tile_boundaries_exact(self):
        """Result must not depend on the tile size (halo correctness)."""
        c, ks = 32, (3, 7, 11)
        x = jax.random.normal(jax.random.key(2), (1, 256, c)) * 0.3
        branches = make_branches(jax.random.key(3), c, ks)
        a = fused_mrf_stage(x, branches, ks, tile=64, interpret=True)
        b = fused_mrf_stage(x, branches, ks, tile=256, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    def test_radius(self):
        assert stage_radius((3, 7, 11)) == 5 * 12
        assert stage_radius((3,)) == 12

    @pytest.mark.parametrize("c,pack", [(32, 4), (64, 2)])
    def test_packed_kernel_matches_reference(self, c, pack):
        ks = (3, 7, 11)
        x = jax.random.normal(jax.random.key(6), (2, 64 * pack * 4, c)) * 0.3
        branches = make_branches(jax.random.key(7), c, ks)
        want = mrf_stage_reference(x, branches, ks)
        got = fused_mrf_stage_packed(x, branches, ks, lane_pack=pack, tile=32,
                                     interpret=True)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)

    def test_packed_kernel_tile_invariance(self):
        c, ks = 32, (3, 7, 11)
        x = jax.random.normal(jax.random.key(8), (1, 512, c)) * 0.3
        branches = make_branches(jax.random.key(9), c, ks)
        a = fused_mrf_stage_packed(x, branches, ks, tile=16, interpret=True)
        b = fused_mrf_stage_packed(x, branches, ks, tile=64, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("cin,cout,pack", [(64, 32, 4), (128, 64, 2)])
    def test_fused_up_mrf_matches_reference(self, cin, cout, pack):
        """lrelu -> ConvTranspose(4,2,1) -> MRF fused == sequential reference."""
        from smart_vocoder_tpu.kernels import fused_up_mrf_stage
        from smart_vocoder_tpu.kernels.decoder import _conv_transpose_polyphase

        ks = (3, 7, 11)
        tu = 256
        u = jax.random.normal(jax.random.key(10), (2, tu, cin)) * 0.3
        keyw = jax.random.split(jax.random.key(11), 2)
        up_w = jax.random.normal(keyw[0], (cin, cout, 4)) * 0.05
        up_b = jax.random.normal(keyw[1], (cout,)) * 0.05
        branches = make_branches(jax.random.key(12), cout, ks)

        x = _conv_transpose_polyphase(
            jax.nn.leaky_relu(u, 0.1), up_w, up_b, 4, 2, 1, jnp.float32)
        want = mrf_stage_reference(x, branches, ks)

        got = fused_up_mrf_stage(
            u, up_w, up_b, 4, 2, 1, branches, ks, lane_pack=pack, tile=64,
            interpret=True,
        )
        assert got.shape == want.shape == (2, tu * 2, cout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-4)

    def test_matches_flax_resblocks(self):
        """Oracle check: the jnp reference equals the real ResBlock1 modules."""
        from smart_vocoder_tpu.nn import ResBlock1

        c, ks = 16, (3, 7)
        x = jax.random.normal(jax.random.key(4), (1, 100, c)) * 0.3
        branches = make_branches(jax.random.key(5), c, ks)

        want = mrf_stage_reference(x, branches, ks)

        acc = None
        for (w1, b1, w2, b2), k in zip(branches, ks):
            mod = ResBlock1(c, k, (1, 3, 5), weight_norm=False)
            params = {}
            for j in range(3):
                # module stores torch layout (out, in, k); branch arrays are HIO
                params[f"convs1_{j}"] = {
                    "weight": jnp.transpose(w1[j], (2, 1, 0)), "bias": b1[j]}
                params[f"convs2_{j}"] = {
                    "weight": jnp.transpose(w2[j], (2, 1, 0)), "bias": b2[j]}
            out = mod.apply({"params": params}, x)
            acc = out if acc is None else acc + out
        want2 = acc / len(ks)
        np.testing.assert_allclose(np.asarray(want), np.asarray(want2), rtol=1e-5, atol=1e-5)
