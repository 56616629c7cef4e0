#!/usr/bin/env python
"""Isolated A/B of the prior+flow stage: module graph vs fused WN kernel.

Sweeps (tile, layers_per_call) of kernels/wn_stack.py on the headline bench
shape (B=32, T=1000 frames, bf16) to decide serving-path routing.
"""
import itertools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.kernels.encoder import enc_p_apply, flow_reverse_apply
from smart_vocoder_tpu.models import build_synthesizer
from smart_vocoder_tpu.ops import sequence_mask

BATCH, FRAMES = 32, 1000
WARMUP, ITERS = 2, 10

hps = load_config("configs/iitp_base.json")
net = build_synthesizer(hps, dtype=jnp.bfloat16, weight_norm=False)
mel = jax.random.normal(jax.random.key(0), (BATCH, FRAMES, 80)) * 2.0 - 4.0
lens = jnp.full((BATCH,), FRAMES, jnp.int32)
spec = jnp.zeros((BATCH, FRAMES, hps.data.filter_length // 2 + 1))
params = jax.jit(lambda k1, k2: net.init(k1, mel, lens, spec, lens, k2)["params"])(
    jax.random.key(1), jax.random.key(2))
mask = sequence_mask(lens, FRAMES).astype(jnp.bfloat16)
eps = jax.random.normal(jax.random.key(3), (BATCH, FRAMES, 192), jnp.float32)


# Two tunnel-backend gotchas (measured, see bench.py): repeated identical
# executions are short-circuited (vary inputs per iter), and
# block_until_ready is NOT a reliable sync (12.6 ms of work reads as 0.3 ms)
# -- only a host value readback (float(...)) proves completion. Every fn here
# must therefore return an f32 scalar checksum.
RNGS = [jax.random.key(100 + i) for i in range(WARMUP + ITERS)]


def timeit(fn, *args):
    """fn(*args, rng) -> f32 checksum scalar; returns ms/iter, readback-synced."""
    float(fn(*args, RNGS[0]))
    for i in range(WARMUP):
        chk = fn(*args, RNGS[i])
    float(chk)
    t0 = time.perf_counter()
    for i in range(ITERS):
        chk = fn(*args, RNGS[WARMUP + i])
    float(chk)
    return (time.perf_counter() - t0) / ITERS * 1e3


@jax.jit
def module_path(params, mel, lens, rng):
    def prior_latent(n, mel, lens, rng):
        _, m_p, logs_p, m = n.enc_p(mel, lens)
        eps = jax.random.normal(rng, m_p.shape, jnp.float32).astype(m_p.dtype)
        z_p = m_p + eps * jnp.exp(logs_p) * 0.667
        return n.flow(z_p, m, g=None, reverse=True) * m
    z = net.apply({"params": params}, mel, lens, rng, method=prior_latent)
    return jnp.sum(z.astype(jnp.float32))


print(f"module graph: {timeit(module_path, params, mel, lens):7.2f} ms",
      flush=True)

for tile, lpc in itertools.product((128, 256, 512), (2, 4, 8)):
    # tile/lpc flow through as explicit kwargs -- monkeypatching the
    # wn_stack module global would NOT reach kernels/encoder.py, which bound
    # fused_wn_stack by value at import (an earlier revision of this sweep
    # measured the default config nine times because of exactly that).
    def fused(params, mel, mask, rng, tile=tile, lpc=lpc):
        kw = {"tile": tile, "layers_per_call": lpc}
        eps = jax.random.normal(rng, (BATCH, FRAMES, 192), jnp.float32)
        m_p, logs_p = enc_p_apply(params["enc_p"], mel, mask, 16, 192,
                                  use_pallas=True, wn_kwargs=kw)
        z_p = m_p + eps.astype(m_p.dtype) * jnp.exp(logs_p) * 0.667
        z = flow_reverse_apply(params["flow"], z_p, mask, 4, 8, 192,
                               use_pallas=True, wn_kwargs=kw)
        return jnp.sum((z * mask).astype(jnp.float32))

    try:
        ms = timeit(jax.jit(fused), params, mel, mask)
        print(f"fused tile={tile:4d} lpc={lpc}: {ms:7.2f} ms", flush=True)
    except Exception as e:
        print(f"fused tile={tile:4d} lpc={lpc}: FAILED {type(e).__name__}: {e}",
              flush=True)
