#!/usr/bin/env python
"""Per-stage decoder timing on the TPU: upsample convs vs MRF stacks,
packed vs unpacked. Usage: python scripts/profile_decoder.py [iters]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from smart_vocoder_tpu.nn import NormConvTranspose1d, ResBlock1

B, FRAMES = 8, 1000
UPS = [(16, 8, 512, 256), (16, 8, 256, 128), (4, 2, 128, 64), (4, 2, 64, 32)]
KS = (3, 7, 11)


def timeit(fn, *args, iters=20):
    g = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    s = float(g(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    t_in = FRAMES
    total = {"up": 0.0, "mrf": 0.0, "mrf_nopack": 0.0}
    for i, (k, u, cin, cout) in enumerate(UPS):
        x = jax.jit(lambda key: jax.random.normal(key, (B, t_in, cin), jnp.bfloat16) * 0.3)(
            jax.random.key(i))

        up = NormConvTranspose1d(cout, k, stride=u, padding=(k - u) // 2, weight_norm=True,
                                 dtype=jnp.bfloat16)
        up_params = up.init(jax.random.key(100 + i), x)["params"]
        dt_up = timeit(lambda x: up.apply({"params": up_params}, x), x, iters=iters)

        t_out = t_in * u
        y = jax.jit(lambda key: jax.random.normal(key, (B, t_out, cout), jnp.bfloat16) * 0.3)(
            jax.random.key(50 + i))

        def mrf(pack):
            mods = [ResBlock1(cout, kk, (1, 3, 5), pack=pack, weight_norm=True,
                              dtype=jnp.bfloat16) for kk in KS]
            ps = [m.init(jax.random.key(200 + i * 10 + j), y)["params"]
                  for j, m in enumerate(mods)]

            def f(y):
                acc = None
                for m, p in zip(mods, ps):
                    o = m.apply({"params": p}, y)
                    acc = o if acc is None else acc + o
                return acc / 3
            return f

        pack = max(1, min(8, 128 // cout))
        dt_mrf = timeit(mrf(pack), y, iters=iters)
        dt_mrf_np = timeit(mrf(1), y, iters=iters)
        print(f"stage{i} T={t_in}->{t_out} C={cin}->{cout}: up {dt_up:.2f} ms, "
              f"mrf(pack={pack}) {dt_mrf:.2f} ms, mrf(nopack) {dt_mrf_np:.2f} ms",
              flush=True)
        total["up"] += dt_up
        total["mrf"] += dt_mrf
        total["mrf_nopack"] += dt_mrf_np
        t_in = t_out
    print(f"TOTAL up {total['up']:.1f} ms, mrf packed {total['mrf']:.1f} ms, "
          f"mrf nopack {total['mrf_nopack']:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
