"""Pin the analytic model-FLOPs counters (utils/flops.py) against XLA's own
``cost_analysis()`` of the unpacked module graphs on CPU.

cost_analysis counts convs/dots as 2 x MACs plus elementwise arithmetic but
*discounts padded edge taps* (measured ~0.9% at T=64), so the two differ by a
few percent in either direction at test sizes; assert within 6%.
Packed/per-tap/Pallas variants deliberately diverge (they inflate executed
MACs), which is exactly why MFU uses the analytic number.
"""

import jax
import jax.numpy as jnp
import pytest

from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.models.discriminator import DiscriminatorP, DiscriminatorS
from smart_vocoder_tpu.models.synthesizer import (
    Generator,
    MelEncoder,
    PosteriorEncoder,
    ResidualCouplingBlock,
)
from smart_vocoder_tpu.utils import flops as F

B, T = 2, 64
SEG = 8192


@pytest.fixture(scope="module")
def hps():
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return load_config(os.path.join(root, "configs", "iitp_base.json"))


def xla_flops(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca["flops"])


def check(analytic, fn, *args, tol=0.06):
    got = xla_flops(fn, *args)
    assert abs(got / analytic - 1) < tol, (analytic, got, got / analytic)


def _apply(mod, *args):
    params = jax.eval_shape(lambda: None)  # placeholder, real init below
    variables = mod.init(jax.random.key(0), *args)
    return lambda *a: mod.apply(variables, *a), variables


def test_mel_encoder(hps):
    mod = MelEncoder(hps.model.inter_channels, hps.model.hidden_channels,
                     weight_norm=False)
    mel = jnp.zeros((B, T, 80))
    lens = jnp.full((B,), T, jnp.int32)
    fn, _ = _apply(mod, mel, lens)
    check(F.mel_encoder_flops(B * T, hps), fn, mel, lens)


def test_posterior_encoder(hps):
    mod = PosteriorEncoder(513, hps.model.inter_channels,
                           hps.model.hidden_channels, weight_norm=False)
    spec = jnp.zeros((B, T, 513))
    lens = jnp.full((B,), T, jnp.int32)
    rng = jax.random.key(1)
    fn, _ = _apply(mod, spec, lens, rng)
    check(F.posterior_encoder_flops(B * T, hps), fn, spec, lens, rng)


def test_flow(hps):
    mod = ResidualCouplingBlock(hps.model.inter_channels,
                                hps.model.hidden_channels, weight_norm=False)
    z = jnp.zeros((B, T, hps.model.inter_channels))
    mask = jnp.ones((B, T, 1))
    fn, _ = _apply(mod, z, mask)
    check(F.flow_flops(B * T, hps), fn, z, mask)


def test_generator(hps):
    m = hps.model
    mod = Generator(m.inter_channels, m.resblock,
                    tuple(m.resblock_kernel_sizes),
                    tuple(tuple(d) for d in m.resblock_dilation_sizes),
                    tuple(m.upsample_rates), m.upsample_initial_channel,
                    tuple(m.upsample_kernel_sizes),
                    channel_pack=False, weight_norm=False)
    z = jnp.zeros((B, T, m.inter_channels))
    fn, _ = _apply(mod, z)
    check(F.generator_flops(B * T, hps), fn, z)


@pytest.mark.parametrize("period", [2, 3, 5, 11])
def test_discriminator_p(period):
    mod = DiscriminatorP(period, use_spectral_norm=False)
    # Large periods shrink late-layer heights to ~10 rows where XLA's
    # padded-edge-tap discount reaches ~10% (the hardware still computes the
    # padded taps, so the analytic full-kernel count is the honest one).
    y = jnp.zeros((B, SEG, 1))
    fn, _ = _apply(mod, y)
    check(F.discriminator_p_flops(SEG, period) * B, fn, y, tol=0.12)


def test_discriminator_s():
    mod = DiscriminatorS(pack_grouped=False)
    y = jnp.zeros((B, SEG, 1))
    fn, _ = _apply(mod, y)
    check(F.discriminator_s_flops(SEG) * B, fn, y)


def test_headline_numbers(hps):
    """The MFU denominators bench.py / scripts/bench_train.py report."""
    fl_serving = F.synthesis_flops(hps, 32, 1000)
    fl_train = F.train_step_flops(hps, 16, 1000)
    # Analytic per-frame costs (iitp_base): generator 0.615 GF + mel-enc
    # 0.014 + flow 0.028 = 0.657 GF/frame -> 21.0 TF at 32x1000. (The round-3
    # profile table's dec 475 GFLOP@512frames is cost_analysis on the packed
    # TRAINING graph -- executed MACs, deliberately not this number.)
    assert 19e12 < fl_serving < 23e12, fl_serving / 1e12
    assert 4.0e12 < fl_train < 6.5e12, fl_train / 1e12
