#!/usr/bin/env python
"""Isolated stage4 (fused up+MRF+tail) tile sweep, bf16 vs hifi, after the
interior-tile nomask + truncation-split changes. Bench geometry: u =
(32, 128000, 64) -> wav (32, 256000, 1).

Usage: python scripts/exp_stage4_hifi.py [iters] [tile ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from smart_vocoder_tpu.kernels.mrf import fused_up_mrf_stage

B, TU, CIN, COUT = 32, 128000, 64, 32
KS, DIL = (3, 7, 11), (1, 3, 5)
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
TILES = [int(a) for a in sys.argv[2:]] or [1024, 2048, 3072]


def main():
    k, s, pad = 4, 2, 1

    @jax.jit
    def make_weights(key):
        ks_ = jax.random.split(key, 64)
        i = 0
        def nxt(*shape, scale=0.05):
            nonlocal i
            out = jax.random.normal(ks_[i], shape, jnp.float32) * scale
            i += 1
            return out
        up_w, up_b = nxt(CIN, COUT, k), nxt(COUT)
        branches = []
        for kk in KS:
            branches.append((
                jnp.stack([nxt(kk, COUT, COUT) for _ in DIL]),
                jnp.stack([nxt(COUT) for _ in DIL]),
                jnp.stack([nxt(kk, COUT, COUT) for _ in DIL]),
                jnp.stack([nxt(COUT) for _ in DIL]),
            ))
        post_w = nxt(1, COUT, 7)
        return up_w, up_b, branches, post_w

    W = make_weights(jax.random.key(0))

    def timeit(fn, label):
        @jax.jit
        def run(W, rng):
            up_w, up_b, branches, post_w = W
            u = (jax.random.normal(rng, (B, TU, CIN), jnp.bfloat16) * 0.3)
            y = fn(u, up_w, up_b, branches, post_w)
            return jnp.sum(y.astype(jnp.float32))

        rng = jax.random.key(1)
        t0 = time.time()
        try:
            chk = float(run(W, rng))
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
            return
        comp = time.time() - t0
        for i in range(3):
            s_ = run(W, jax.random.fold_in(rng, i))
        float(s_)
        t0 = time.perf_counter()
        for i in range(ITERS):
            s_ = run(W, jax.random.fold_in(rng, 100 + i))
        float(s_)
        print(f"{label}: {(time.perf_counter()-t0)/ITERS*1e3:8.2f} ms "
              f"(compile {comp:.0f}s, chk {chk:.0f})", flush=True)

    timeit(lambda u, *a: u, "rng baseline        ")
    for hifi in (False, True):
        for tile in TILES:
            timeit(
                lambda u, up_w, up_b, br, post_w, tile=tile, hifi=hifi:
                fused_up_mrf_stage(u, up_w, up_b, 4, 2, 1, br, KS, DIL,
                                   tile=tile, post_weight=post_w, hifi=hifi),
                f"hifi={int(hifi)} tile={tile:5d}")


if __name__ == "__main__":
    main()
