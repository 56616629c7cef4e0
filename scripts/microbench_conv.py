#!/usr/bin/env python
"""Microbenchmarks for decoder conv strategies on the TPU.

Usage: python scripts/microbench_conv.py <case> [iters]
Cases: up_dilated, up_poly, s2_conv, s4_conv, s4_packed3, s4_packed4
Everything runs under jit (op-by-op execution is unreliable over the tunnel).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

B = 8


def make(shape):
    return jax.jit(
        lambda k: jax.random.normal(k, shape, jnp.bfloat16) * 0.02
    )(jax.random.key(0))


def conv(x, w, dil=1, pad=None, lhs_dil=1):
    k = w.shape[0]
    if pad is None:
        pad = (k * dil - dil) // 2
        pads = (pad, pad)
    else:
        pads = pad
    return lax.conv_general_dilated(
        x, w, (1,), [pads], rhs_dilation=(dil,), lhs_dilation=(lhs_dil,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )


def up_poly(x, w, s=8):
    y = conv(x, w, pad=(1, 0))
    b, t, c = y.shape
    return y.reshape(b, t * s, c // s)


CASES = {
    # up0: (1000,512) -> (8000,256)
    "up_dilated": lambda: (make((B, 1000, 512)), make((16, 512, 256)),
                           functools.partial(conv, lhs_dil=8, pad=(11, 11))),
    "up_poly": lambda: (make((B, 1000, 512)), make((2, 512, 2048)), up_poly),
    # stage2 resblock conv: (64000,128) k7 d3
    "s2_conv": lambda: (make((B, 64000, 128)), make((7, 128, 128)),
                        functools.partial(conv, dil=3)),
    # stage4: (256000,32) k11
    "s4_conv": lambda: (make((B, 256000, 32)), make((11, 32, 32)), conv),
    # space-to-depth packed stage4 equivalents
    "s4_packed3": lambda: (make((B, 32000, 256)), make((3, 256, 256)), conv),
    "s4_packed4": lambda: (make((B, 32000, 256)), make((4, 256, 256)), conv),
    # stage3: (128000,64) k7
    "s3_conv": lambda: (make((B, 128000, 64)), make((7, 64, 64)), conv),
    "s3_packed": lambda: (make((B, 32000, 256)), make((3, 256, 256)), conv),
}


def main():
    case = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    x, w, f = CASES[case]()
    g = jax.jit(lambda x, w: jnp.sum(f(x, w).astype(jnp.float32)))
    s = float(g(x, w))
    t0 = time.perf_counter()
    for _ in range(iters):
        s_dev = g(x, w)
    s = float(s_dev)
    dt = (time.perf_counter() - t0) / iters
    print(f"{case}: {dt*1e3:.3f} ms (chk {s:.1f})", flush=True)


if __name__ == "__main__":
    main()
