#!/usr/bin/env python
"""Same-process A/B: per-tap vs block-Toeplitz packed MRF stage (stage3).

VERDICT r2 item 2: the dense Toeplitz form pays 2.7-4.7x MAC inflation on
the d in (3,5) convs; pack_conv_weight_pertap spends exactly one full-lane
dot per tap (126 -> 90 MXU passes at the iitp stage3 geometry).

Usage: python scripts/exp_pertap.py [batch] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from smart_vocoder_tpu.kernels.mrf import fused_mrf_stage_packed

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
T, C = 128000, 64
KS, DIL = (3, 7, 11), (1, 3, 5)


def timeit(fn, x0, label):
    @jax.jit
    def step(x, i):
        y = fn(x + i.astype(x.dtype) * 1e-6)
        return y, jnp.sum(y.astype(jnp.float32))

    t0 = time.time()
    _, chk = step(x0, jnp.float32(0))
    print(f"{label}: compile {time.time()-t0:.1f}s chk {float(chk):.1f}", flush=True)
    for i in range(3):
        _, chk = step(x0, jnp.float32(i))
    float(chk)
    t0 = time.perf_counter()
    for i in range(ITERS):
        _, chk = step(x0, jnp.float32(100 + i))
    float(chk)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label}: {ms:.2f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(5)

    def r(*shape, scale=0.05):
        return jnp.asarray(rng.normal(0, scale, shape), jnp.bfloat16)

    branches = [
        (jnp.stack([r(k, C, C) for _ in DIL]), jnp.stack([r(C) for _ in DIL]),
         jnp.stack([r(k, C, C) for _ in DIL]), jnp.stack([r(C) for _ in DIL]))
        for k in KS
    ]
    x = r(BATCH, T, C, scale=0.5)

    for f32s in (False, True):
        tag = " f32s" if f32s else " bf16"
        a = timeit(lambda v: fused_mrf_stage_packed(v, branches, KS, DIL,
                                                    f32_storage=f32s, pertap=False),
                   x, "toeplitz" + tag)
        b = timeit(lambda v: fused_mrf_stage_packed(v, branches, KS, DIL,
                                                    f32_storage=f32s, pertap=True),
                   x, "pertap  " + tag)
        a2 = timeit(lambda v: fused_mrf_stage_packed(v, branches, KS, DIL,
                                                     f32_storage=f32s, pertap=False),
                    x, "toep rpt" + tag)
        print(f"[{tag.strip()}] pertap delta: {b - (a + a2) / 2:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
