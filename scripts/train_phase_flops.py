#!/usr/bin/env python
"""Analytic FLOPs per train-step phase, for roofline calibration.

Compiles each phase's forward subgraph in isolation and reads XLA's
`cost_analysis()['flops']`. Conv/dot FLOPs are backend-independent, so this
runs fine on CPU (`JAX_PLATFORMS=cpu`) with no chip time; pair the numbers
with the device-time table from scripts/train_phase_profile.py:

    utilization = flops * (1 + 2 for bwd) / device_time / peak

Usage: JAX_PLATFORMS=cpu python scripts/train_phase_flops.py [frames] [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.models import MultiPeriodDiscriminator, build_synthesizer
from smart_vocoder_tpu.ops import MelConfig, mel_spectrogram

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def flops_of(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0))


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hps = load_config(os.path.join(root, "configs", "iitp_base.json"))
    hop = hps.data.hop_length
    seg = hps.train.segment_size          # 8192 samples
    seg_frames = seg // hop               # 32 frames

    net_g = build_synthesizer(hps, dtype=jnp.bfloat16)
    net_d = MultiPeriodDiscriminator(dtype=jnp.bfloat16)
    mel_cfg = MelConfig.from_hparams(hps)

    mel = jnp.zeros((BATCH, FRAMES, 80))
    spec = jnp.zeros((BATCH, FRAMES, 513))
    lens = jnp.full((BATCH,), FRAMES, jnp.int32)
    rng = jax.random.key(0)
    params = jax.jit(net_g.init)(rng, mel, lens, spec, lens, rng)["params"]
    y = jnp.zeros((BATCH, seg, 1))
    params_d = jax.jit(net_d.init)(jax.random.key(1), y, y)["params"]

    z = jnp.zeros((BATCH, FRAMES, hps.model.inter_channels))
    z_slice = jnp.zeros((BATCH, seg_frames, hps.model.inter_channels))
    mask = jnp.ones((BATCH, FRAMES, 1))

    # Each phase as a submodule apply (setup() attrs, so method=lambda works).
    rows = [
        ("enc_p fwd", lambda m, x, l: m.enc_p(x, l), (mel, lens)),
        ("enc_q fwd", lambda m, s, l, k: m.enc_q(s, l, k), (spec, lens, rng)),
        ("flow fwd", lambda m, zz, mk: m.flow(zz, mk), (z, mask)),
        ("dec fwd (32-frame slice)", lambda m, zz: m.dec(zz), (z_slice,)),
    ]
    for name, method, args in rows:
        fl = flops_of(
            lambda *a, _m=method: net_g.apply({"params": params}, *a, method=_m),
            *args)
        print(f"{name:<28} {fl / 1e9:8.2f} GFLOP")
    for name, fn, args in [
        ("D fwd (one apply: r+g)",
         lambda a, b: net_d.apply({"params": params_d}, a, b), (y, y)),
        ("mel_spectrogram(seg)",
         lambda w: mel_spectrogram(w, mel_cfg), (jnp.zeros((BATCH, seg)),)),
    ]:
        print(f"{name:<28} {flops_of(fn, *args) / 1e9:8.2f} GFLOP")


if __name__ == "__main__":
    main()
