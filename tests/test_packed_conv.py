"""Space-to-depth packed convolution: exactness vs the direct lowering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_vocoder_tpu.nn.conv import NormConv1d, pack_conv_weight


def direct_conv(x, w_hio, dilation):
    k = w_hio.shape[0]
    pad = (k * dilation - dilation) // 2
    return jax.lax.conv_general_dilated(
        x, w_hio, (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )


class TestPackConvWeight:
    @pytest.mark.parametrize("k,d,p", [
        (3, 1, 4), (7, 1, 4), (11, 1, 4),
        (3, 3, 4), (11, 5, 4),
        (7, 3, 2), (11, 5, 2), (5, 1, 8),
    ])
    def test_exact_vs_direct(self, k, d, p):
        cin = cout = 16
        key = jax.random.key(k * 100 + d * 10 + p)
        x = jax.random.normal(key, (2, 64 * p, cin))
        w = jax.random.normal(jax.random.fold_in(key, 1), (k, cin, cout)) * 0.1

        want = direct_conv(x, w, d)

        wp, pad_lo, pad_hi = pack_conv_weight(w, d, p)
        xp = x.reshape(2, -1, p * cin)
        got = jax.lax.conv_general_dilated(
            xp, wp, (1,), [(pad_lo, pad_hi)], dimension_numbers=("NHC", "HIO", "NHC"),
        ).reshape(x.shape[0], x.shape[1], cout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    def test_rectangular_channels(self):
        x = jax.random.normal(jax.random.key(0), (1, 32, 8))
        w = jax.random.normal(jax.random.key(1), (5, 8, 24)) * 0.1
        want = direct_conv(x, w, 1)
        wp, lo, hi = pack_conv_weight(w, 1, 4)
        got = jax.lax.conv_general_dilated(
            x.reshape(1, 8, 32), wp, (1,), [(lo, hi)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        ).reshape(1, 32, 24)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


class TestPackConvWeightPertap:
    """pack_conv_weight_pertap + the kernel-side operand assembly
    (_pertap_operands) reproduce the direct dilated conv exactly, for any
    gcd(d, p) = 1 — including p=4 (stage4 geometry) and the prefix-select
    boundary cases."""

    @pytest.mark.parametrize("k,d,p", [
        (3, 3, 2), (7, 3, 2), (11, 5, 2), (5, 7, 2),
        (3, 3, 4), (11, 5, 4), (7, 3, 4),
        (3, 5, 8), (5, 3, 8),
    ])
    def test_exact_vs_direct(self, k, d, p):
        from smart_vocoder_tpu.kernels.mrf import _pertap_operands
        from smart_vocoder_tpu.nn.conv import pack_conv_weight_pertap

        cin = cout = 16
        key = jax.random.key(k * 100 + d * 10 + p)
        x = jax.random.normal(key, (64 * p, cin))
        w = jax.random.normal(jax.random.fold_in(key, 1), (k, cin, cout)) * 0.1

        want = direct_conv(x[None], w, d)[0].reshape(-1, p * cout)

        wt, shifts, lo, hi = pack_conv_weight_pertap(w, d, p)
        assert wt.shape == (k, p * cin, p * cout)
        xp = x.reshape(-1, p * cin)
        acc = jnp.zeros((xp.shape[0], p * cout), jnp.float32)
        for t, v in enumerate(_pertap_operands(xp, lo, hi, shifts)):
            acc = acc + jnp.dot(v, wt[t])
        np.testing.assert_allclose(np.asarray(acc), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_padding_matches_toeplitz(self):
        from smart_vocoder_tpu.nn.conv import pack_conv_weight_pertap

        for k, d, p in [(3, 3, 2), (11, 5, 4)]:
            w = jnp.ones((k, 4, 4))
            _, lo_t, hi_t = pack_conv_weight(w, d, p)
            _, _, lo_p, hi_p = pack_conv_weight_pertap(w, d, p)
            assert (lo_p, hi_p) == (lo_t, hi_t)

    def test_rejects_colliding_phases(self):
        from smart_vocoder_tpu.nn.conv import pack_conv_weight_pertap

        with pytest.raises(AssertionError):
            pack_conv_weight_pertap(jnp.ones((3, 4, 4)), 2, 4)


class TestNormConv1dPacked:
    def test_module_packed_equals_unpacked(self):
        x = jax.random.normal(jax.random.key(2), (2, 128, 32))
        kwargs = dict(features=32, kernel_size=11, padding=25, dilation=5, weight_norm=True)
        a = NormConv1d(**kwargs, pack=1)
        b = NormConv1d(**kwargs, pack=4)
        params = a.init(jax.random.key(3), x)["params"]
        ya = a.apply({"params": params}, x)
        yb = b.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(yb), np.asarray(ya), rtol=1e-5, atol=1e-5)

    def test_falls_back_when_t_not_divisible(self):
        x = jax.random.normal(jax.random.key(4), (1, 130, 32))  # 130 % 4 != 0
        mod = NormConv1d(features=32, kernel_size=3, padding=1, pack=4)
        params = mod.init(jax.random.key(5), x)["params"]
        y = mod.apply({"params": params}, x)
        assert y.shape == (1, 130, 32)


class TestPackedGroupedConv:
    """The space-to-depth grouped-conv path (NormConv1d._packed_grouped):
    exactness (forward AND gradients) vs lax's feature_group_count lowering
    across the DiscriminatorS geometries (ref models.py:211-218), where the
    4-channels-per-group convs are MXU-lane-starved."""

    GEOMS = [  # (cin, cout, k, stride, groups, pad, t)
        (16, 64, 41, 4, 4, 20, 8192),
        (64, 256, 41, 4, 16, 20, 2048),
        (256, 1024, 41, 4, 64, 20, 512),
        (1024, 1024, 41, 4, 256, 20, 128),
        (8, 8, 5, 1, 2, 2, 64),       # stride-1 grouped
    ]

    def _pair(self, cin, cout, k, s, g, pad, t, seed=0):
        conv_fast = NormConv1d(cout, k, stride=s, padding=pad, groups=g,
                               use_bias=True)
        conv_ref = NormConv1d(cout, k, stride=s, padding=pad, groups=g,
                              use_bias=True, pack_grouped=False)
        x = jax.random.normal(jax.random.key(seed), (2, t, cin))
        params = conv_ref.init(jax.random.key(seed + 1), x)["params"]
        return conv_fast, conv_ref, x, params

    @pytest.mark.parametrize("geom", GEOMS)
    def test_forward_exact(self, geom):
        conv_fast, conv_ref, x, params = self._pair(*geom)
        want = conv_ref.apply({"params": params}, x)
        got = conv_fast.apply({"params": params}, x)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_routing(self):
        # lane-starved grouped geometry routes to the packed path (no
        # conv_general_dilated in the jaxpr); cg > 32 keeps the direct conv
        conv_fast, _, x, params = self._pair(*self.GEOMS[0])
        jx = str(jax.make_jaxpr(
            lambda p, v: conv_fast.apply({"params": p}, v))(params, x))
        assert "conv_general_dilated" not in jx
        wide = NormConv1d(128, 5, stride=1, padding=2, groups=2)
        xw = jnp.zeros((1, 64, 128))
        pw = wide.init(jax.random.key(0), xw)["params"]
        jw = str(jax.make_jaxpr(
            lambda p, v: wide.apply({"params": p}, v))(pw, xw))
        assert "conv_general_dilated" in jw

    @pytest.mark.parametrize("geom", GEOMS[:2])
    def test_gradients_exact(self, geom):
        conv_fast, conv_ref, x, params = self._pair(*geom)

        def loss(mod):
            return lambda p, v: jnp.sum(
                jnp.sin(mod.apply({"params": p}, v)))

        g_fast = jax.grad(loss(conv_fast), argnums=(0, 1))(params, x)
        g_ref = jax.grad(loss(conv_ref), argnums=(0, 1))(params, x)
        for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


class TestPerTapPackedConv:
    """NormConv1d's opt-in per-tap packed path (pertap_xla=True; k < kp:
    strongly dilated taps take k shifted full-lane dots instead of the
    kp-tap block-Toeplitz conv): exact forward and gradients vs the direct
    lowering. Default-off -- measured slower than Toeplitz under XLA (see
    nn/conv.py) -- but kept correct as a building block."""

    GEOMS = [  # (k, d, p, cin, cout) -- all have k < kp
        (11, 5, 2, 64, 64),
        (7, 3, 2, 64, 64),
        (3, 5, 4, 32, 32),
        (11, 5, 4, 32, 32),
    ]

    def _pair(self, k, d, p, cin, cout, seed=0):
        pad = (k * d - d) // 2
        fast = NormConv1d(cout, k, padding=pad, dilation=d, pack=p,
                          pertap_xla=True)
        ref = NormConv1d(cout, k, padding=pad, dilation=d)
        x = jax.random.normal(jax.random.key(seed), (2, 32 * p, cin))
        params = ref.init(jax.random.key(seed + 1), x)["params"]
        return fast, ref, x, params

    @pytest.mark.parametrize("geom", GEOMS)
    def test_forward_exact(self, geom):
        fast, ref, x, params = self._pair(*geom)
        k, d, p = geom[:3]
        r = d * (k - 1) // 2
        kp = (p - 1 + d * (k - 1) - r) // p + (r + p - 1) // p + 1
        assert k < kp, "geometry must exercise the per-tap branch"
        want = ref.apply({"params": params}, x)
        got = fast.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_exact(self):
        fast, ref, x, params = self._pair(*self.GEOMS[0])

        def loss(mod):
            return lambda pp, v: jnp.sum(jnp.sin(mod.apply({"params": pp}, v)))

        g_fast = jax.grad(loss(fast), argnums=(0, 1))(params, x)
        g_ref = jax.grad(loss(ref), argnums=(0, 1))(params, x)
        for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_toeplitz_kept_when_denser(self):
        # d=1, k=3, p=4: kp = 3 = k -> block-Toeplitz conv stays even with
        # the opt-in flag (the k < kp decision rule)
        conv = NormConv1d(32, 3, padding=1, dilation=1, pack=4,
                          pertap_xla=True)
        x = jnp.zeros((1, 64, 32))
        params = conv.init(jax.random.key(0), x)["params"]
        jx = str(jax.make_jaxpr(
            lambda pp, v: conv.apply({"params": pp}, v))(params, x))
        assert "conv_general_dilated" in jx
