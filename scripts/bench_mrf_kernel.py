#!/usr/bin/env python
"""Compare fused Pallas MRF stage variants vs the XLA conv path on the TPU.

Tunnel-safe methodology: inputs are re-derived from a per-iteration rng
(identical-input executions are short-circuited by the backend) and every
timed loop ends in a host readback of an in-graph checksum
(block_until_ready is not a reliable barrier here) -- see bench.py.

Usage: python scripts/bench_mrf_kernel.py [stage] [iters] [tile ...]
Stages: 1 -> (8000,256), 2 -> (64000,128), 3 -> (128000,64), 4 -> (256000,32)
at batch 32 (the headline bench shape).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from smart_vocoder_tpu.kernels import (
    fused_mrf_stage_packed,
    mrf_stage_reference,
)
from smart_vocoder_tpu.kernels.mrf import fused_mrf_stage

SHAPES = {1: (8000, 256), 2: (64000, 128), 3: (128000, 64), 4: (256000, 32)}
KS = (3, 7, 11)
B = 32


def main():
    stage = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    tiles = [int(a) for a in sys.argv[3:]] or [512, 1024, 2048]
    t, c = SHAPES[stage]

    @jax.jit
    def make_branches(key):
        ks = jax.random.split(key, 12 * len(KS))
        branches, i = [], 0
        for k in KS:
            w1 = jax.random.normal(ks[i], (3, k, c, c), jnp.bfloat16) * 0.05; i += 1
            b1 = jax.random.normal(ks[i], (3, c), jnp.bfloat16) * 0.05; i += 1
            w2 = jax.random.normal(ks[i], (3, k, c, c), jnp.bfloat16) * 0.05; i += 1
            b2 = jax.random.normal(ks[i], (3, c), jnp.bfloat16) * 0.05; i += 1
            branches.append((w1, b1, w2, b2))
        return branches

    branches = make_branches(jax.random.key(0))

    def timeit(stage_fn):
        @jax.jit
        def run(branches, rng):
            x = jax.random.normal(rng, (B, t, c), jnp.bfloat16) * 0.3
            return jnp.sum(stage_fn(x, branches).astype(jnp.float32))

        rng = jax.random.key(1)
        t0 = time.time()
        chk = float(run(branches, rng))
        compile_s = time.time() - t0
        for i in range(3):
            s_dev = run(branches, jax.random.fold_in(rng, i))
        float(s_dev)
        t0 = time.perf_counter()
        for i in range(iters):
            s_dev = run(branches, jax.random.fold_in(rng, 100 + i))
        float(s_dev)
        return (time.perf_counter() - t0) / iters * 1e3, compile_s, chk

    # rng-generation overhead baseline (subtract mentally; ~1-2 ms at stage4)
    ms, _, _ = timeit(lambda x, br: x)
    print(f"stage{stage} ({t}x{c}) B={B}: rng-gen baseline {ms:.2f} ms", flush=True)

    ms, cs, chk = timeit(lambda x, br: mrf_stage_reference(x, br, KS))
    print(f"xla            : {ms:8.2f} ms  (compile {cs:.0f}s, chk {chk:.0f})",
          flush=True)
    for tile in tiles:
        try:
            ms, cs, chk = timeit(lambda x, br, tile=tile:
                                 fused_mrf_stage_packed(x, br, KS, tile=tile))
            print(f"packed tile={tile:5d}: {ms:8.2f} ms  (compile {cs:.0f}s, "
                  f"chk {chk:.0f})", flush=True)
        except Exception as e:
            print(f"packed tile={tile:5d}: FAILED {type(e).__name__}: {e}",
                  flush=True)
    if c >= 128:
        # pack=1 stages (c>=128): the UNPACKED kernel has zero Toeplitz
        # inflation (direct dilated taps at full lane width)
        for tile in tiles:
            try:
                ms, cs, chk = timeit(lambda x, br, tile=tile:
                                     fused_mrf_stage(x, br, KS, tile=tile))
                print(f"unpack tile={tile:5d}: {ms:8.2f} ms  (compile {cs:.0f}s, "
                      f"chk {chk:.0f})", flush=True)
            except Exception as e:
                print(f"unpack tile={tile:5d}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
