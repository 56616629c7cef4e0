#!/usr/bin/env python
"""Compare the fused Pallas MRF stage vs the XLA conv path on the TPU.

Usage: python scripts/bench_mrf_kernel.py [stage] [iters]
Stages: 2 -> (64000,128), 3 -> (128000,64), 4 -> (256000,32) at batch 8.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from smart_vocoder_tpu.kernels import (
    fused_mrf_stage,
    fused_mrf_stage_packed,
    mrf_stage_reference,
)

SHAPES = {1: (8000, 256), 2: (64000, 128), 3: (128000, 64), 4: (256000, 32)}
KS = (3, 7, 11)
B = 8


def main():
    stage = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    t, c = SHAPES[stage]

    @jax.jit
    def make_inputs(key):
        ks = jax.random.split(key, 1 + 12 * len(KS))
        x = jax.random.normal(ks[0], (B, t, c), jnp.bfloat16) * 0.3
        branches = []
        i = 1
        for k in KS:
            w1 = jax.random.normal(ks[i], (3, k, c, c), jnp.bfloat16) * 0.05; i += 1
            b1 = jax.random.normal(ks[i], (3, c), jnp.bfloat16) * 0.05; i += 1
            w2 = jax.random.normal(ks[i], (3, k, c, c), jnp.bfloat16) * 0.05; i += 1
            b2 = jax.random.normal(ks[i], (3, c), jnp.bfloat16) * 0.05; i += 1
            branches.append((w1, b1, w2, b2))
        return x, branches

    x, branches = make_inputs(jax.random.key(0))

    ref = jax.jit(lambda x, br: jnp.sum(
        mrf_stage_reference(x, br, KS).astype(jnp.float32)))
    fused = jax.jit(lambda x, br: jnp.sum(
        fused_mrf_stage_packed(x, br, KS, tile=tile).astype(jnp.float32)))

    for name, fn in [("xla", ref), ("pallas_packed", fused)]:
        t0 = time.time()
        s = float(fn(x, branches))
        print(f"{name}: compile+run {time.time()-t0:.1f}s chk {s:.1f}", flush=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            s_dev = fn(x, branches)
        s = float(s_dev)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name} stage{stage} ({t}x{c}) tile={tile}: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
