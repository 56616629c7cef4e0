"""Multi-period + multi-scale discriminator ensemble (reference models.py:170-257).

Waveforms are ``(B, samples, 1)``. Each discriminator returns (logits, fmaps);
the ensemble returns per-discriminator lists for real and generated inputs --
the exact structure the loss layer consumes (losses.py:7-43).
"""

from __future__ import annotations

from typing import List, Tuple  # noqa: F401 (Tuple used in field annotation)

import flax.linen as nn
import jax.numpy as jnp

from smart_vocoder_tpu.nn import LRELU_SLOPE, NormConv1d, NormConv2d


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return int((kernel_size * dilation - dilation) / 2)


class DiscriminatorP(nn.Module):
    """Period discriminator: fold time into (T/p, p) and convolve along T/p
    with (k, 1) kernels (ref: models.py:170-204).

    ``width_mult`` scales channel counts (1.0 == reference widths); used for
    cheap test variants and capacity sweeps.

    ``fold_period`` evaluates the stack with the width-``p`` period axis
    folded into the batch dimension -- bit-identical contraction (a (k, 1)
    kernel never mixes W; params unchanged), but the convs become 1-D with
    the long H axis in the sublane dimension instead of W = 2..11 wasting
    most of each 8-sublane tile. Logits keep the exact reference flatten
    order; fmaps come out (B, p, H, C) instead of (B, H, p, C) -- the same
    elements, so the feature-matching L1 (a mean, losses.py:7-15) is
    unchanged.

    Default OFF: measured on v5e (scripts/ab_disc_fold.py, both variants in
    one process, full GAN step B=16x1000) the fold ran 317.4 ms/step vs
    69.6 ms unfolded -- 4.5x SLOWER (and a 928 s compile). XLA already
    handles the W=p layout well; the fold's transposes + B*p batch dominate.
    Kept as a tested opt-in documenting the rejection."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    width_mult: float = 1.0
    use_spectral_norm: bool = False
    fold_period: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        fmap = []
        b, t, c = x.shape
        if t % self.period != 0:  # reflect-pad to a multiple of the period
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            t = t + n_pad
        h = t // self.period
        x = x.reshape(b, h, self.period, c)  # NHWC
        if self.fold_period:
            # (B, H, p, C) -> (B*p, H, C): W never mixes under (k, 1) kernels
            x = x.transpose(0, 2, 1, 3).reshape(b * self.period, h, c)

        sn = self.use_spectral_norm
        pad = _get_padding(self.kernel_size, 1)
        for i, ch in enumerate([32, 128, 512, 1024, 1024]):
            ch = max(4, int(ch * self.width_mult))
            stride = self.stride if i < 4 else 1
            x = NormConv2d(
                ch, (self.kernel_size, 1), (stride, 1), (pad, 0),
                weight_norm=not sn, spectral_norm=sn,
                dtype=self.dtype, name=f"convs_{i}",
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x.reshape(b, self.period, -1, ch)
                        if self.fold_period else x)
        x = NormConv2d(1, (3, 1), (1, 1), (1, 0), weight_norm=not sn,
                       spectral_norm=sn, dtype=self.dtype, name="conv_post")(x)
        if self.fold_period:
            x = x.reshape(b, self.period, -1, 1)
            fmap.append(x)
            # restore the reference's (B, H', p) row-major flatten order
            return x[..., 0].transpose(0, 2, 1).reshape(b, -1), fmap
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator on the raw waveform: grouped strided 1-D convs
    (ref: models.py:207-232). ``width_mult`` as in DiscriminatorP; groups are
    reduced to gcd(groups, in, out) which leaves reference widths unchanged."""

    width_mult: float = 1.0
    use_spectral_norm: bool = False
    pack_grouped: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        import math

        sn = self.use_spectral_norm
        fmap = []
        b = x.shape[0]
        specs = [  # (features, kernel, stride, groups, padding) per models.py:211-218
            (16, 15, 1, 1, 7),
            (64, 41, 4, 4, 20),
            (256, 41, 4, 16, 20),
            (1024, 41, 4, 64, 20),
            (1024, 41, 4, 256, 20),
            (1024, 5, 1, 1, 2),
        ]
        for i, (ch, k, s, g, p) in enumerate(specs):
            ch = max(8, int(ch * self.width_mult))
            g = math.gcd(math.gcd(g, x.shape[-1]), ch)
            x = NormConv1d(ch, k, stride=s, padding=p, groups=g,
                           weight_norm=not sn, spectral_norm=sn,
                           pack_grouped=self.pack_grouped,
                           dtype=self.dtype, name=f"convs_{i}")(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = NormConv1d(1, 3, stride=1, padding=1, weight_norm=not sn,
                       spectral_norm=sn, dtype=self.dtype, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """1x DiscriminatorS + 5x DiscriminatorP (periods 2,3,5,7,11)
    (ref: models.py:235-257). ``use_spectral_norm`` swaps weight norm for
    spectral norm on every conv like the reference's norm_f selection
    (models.py:175, :210); power-iteration state lives in the mutable
    'spectral' collection (see nn/conv.py)."""

    use_spectral_norm: bool = False
    width_mult: float = 1.0
    # Escape hatch for the space-to-depth grouped-conv GEMM in DiscriminatorS
    # (see nn/conv.py NormConv1d.pack_grouped); parameters are identical
    # either way.
    pack_grouped: bool = True
    # Run (y, y_hat) as ONE doubled batch per discriminator instead of two
    # separate conv chains: exactly the same per-sample math (convs are
    # batch-parallel), half the op count, and the late small-spatial layers
    # (101 rows at B=16) get a 2x fatter GEMM M dimension.
    pair_batched: bool = True
    # Fold each P-discriminator's period axis into batch -- measured 4.5x
    # SLOWER on v5e, default OFF (see DiscriminatorP docstring)
    fold_period: bool = False
    dtype: jnp.dtype = jnp.float32
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)  # reference models.py:238

    def setup(self):
        periods = list(self.periods)
        discs = [DiscriminatorS(width_mult=self.width_mult,
                                use_spectral_norm=self.use_spectral_norm,
                                pack_grouped=self.pack_grouped,
                                dtype=self.dtype, name="discriminators_0")]
        discs += [
            DiscriminatorP(p, width_mult=self.width_mult,
                           use_spectral_norm=self.use_spectral_norm,
                           fold_period=self.fold_period,
                           dtype=self.dtype, name=f"discriminators_{i + 1}")
            for i, p in enumerate(periods)
        ]
        self.discs = discs

    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        # Pair batching halves the power-iteration count per apply (one
        # forward instead of two), so under spectral norm keep the
        # reference's two-forward trajectory (torch's hook advances u on
        # every forward, models.py:175).
        if (self.pair_batched and not self.use_spectral_norm
                and y.shape == y_hat.shape):
            b = y.shape[0]
            both = jnp.concatenate([y, y_hat], axis=0)
            for d in self.discs:
                logits, fmaps = d(both)
                y_d_rs.append(logits[:b])
                y_d_gs.append(logits[b:])
                fmap_rs.append([f[:b] for f in fmaps])
                fmap_gs.append([f[b:] for f in fmaps])
            return y_d_rs, y_d_gs, fmap_rs, fmap_gs
        for d in self.discs:
            y_d_r, fmap_r = d(y)
            y_d_g, fmap_g = d(y_hat)
            y_d_rs.append(y_d_r)
            y_d_gs.append(y_d_g)
            fmap_rs.append(fmap_r)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
