#!/usr/bin/env python
"""Same-process A/B: custom-VJP fused MRF stage vs XLA autodiff (training).

VERDICT r4 item 5: dec bwd sits at 48% util under XLA -- build the hand-VJP
Pallas training kernel and adopt or reject with numbers.  For each decoder
stage's TRAINING shape (B=16 segment slices, reference train.py segment_size
8192 -> 32 frames; models.py:115-167), times `value_and_grad` of a scalar over
one MRF stage through three formulations:

  xla_pack  : the real training-graph leg -- ResBlock1 flax modules with the
              production channel_pack default (space-to-depth for ch<128).
  xla_dense : ResBlock1 with pack=1 (plain lax convs), XLA autodiff.
  kernel    : kernels/mrf_train.mrf_stage_train (fused Pallas fwd +
              per-branch recompute-in-VMEM hand-VJP bwd).

Timing blocks are interleaved (A,B,C,A,B,C,...) so tunnel throughput drift
cancels (round-4 lesson).  Stage 0 (C=256) exceeds VMEM for the kernel's
per-branch weights+grads and is reported n/a.

Usage: python scripts/ab_mrf_train.py [reps] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from smart_vocoder_tpu.kernels.mrf_train import mrf_stage_train
from smart_vocoder_tpu.models.synthesizer import Generator  # noqa: F401 (env check)
from smart_vocoder_tpu.nn.resblock import ResBlock1

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
KS = (3, 7, 11)
DILS = (1, 3, 5)
B = 16
SEG_FRAMES = 32
RATES = (8, 8, 2, 2)
DTYPE = jnp.bfloat16


def stage_shapes():
    t = SEG_FRAMES
    ch = 512
    for i, r in enumerate(RATES):
        t *= r
        ch //= 2
        yield i, t, ch


def make_flax_stage(ch, pack):
    import flax.linen as nn

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, x):
            xs = None
            for j, k in enumerate(KS):
                blk = ResBlock1(ch, k, DILS, pack=pack, dtype=DTYPE,
                                weight_norm=True, name=f"resblocks_{j}")(x)
                xs = blk if xs is None else xs + blk
            return xs / len(KS)

    return Stage()


def bench_leg(fn, args, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  reps={REPS} iters={ITERS}")
    print(f"{'stage':>5} {'T':>6} {'ch':>4} | {'xla_pack':>9} {'xla_dense':>10} "
          f"{'kernel':>8}  (ms/step, fwd+bwd)")
    for i, t, ch in stage_shapes():
        x = jnp.asarray(rng.normal(0, 1, (B, t, ch)), DTYPE)

        legs = {}
        # flax legs (pack default mirrors Generator: p=min(8,128//ch) if <128)
        for name, pack in (("xla_pack", max(1, min(8, 128 // ch))),
                           ("xla_dense", 1)):
            stage = make_flax_stage(ch, pack)
            params = stage.init(jax.random.key(0), x)

            @jax.jit
            def vg(params, x, _stage=stage):
                def loss(p, x):
                    return jnp.mean(jnp.abs(_stage.apply(p, x)).astype(jnp.float32))
                return jax.value_and_grad(loss)(params, x)

            legs[name] = (vg, (params, x))

        # kernel leg: plain folded arrays; grads wrt x and weights
        branches = []
        for k in KS:
            branches.append(tuple(
                jnp.asarray(rng.normal(0, 0.05, s), DTYPE)
                for s in ((3, k, ch, ch), (3, ch), (3, k, ch, ch), (3, ch))))
        # worst branch (k=11): 4 bf16 weight arrays (w1,w2 + flipped copies)
        # + 2 f32 grad accumulators, each (3,k,ch,ch), resident in VMEM
        w_bytes = (4 * 2 + 2 * 4) * 3 * max(KS) * ch * ch
        if w_bytes < 12 * 2 ** 20:
            @jax.jit
            def vg_k(x, branches):
                def loss(x, br):
                    return jnp.mean(jnp.abs(
                        mrf_stage_train(x, br, KS, DILS)).astype(jnp.float32))
                return jax.value_and_grad(loss, argnums=(0, 1))(x, branches)

            legs["kernel"] = (vg_k, (x, branches))

        acc = {n: [] for n in legs}
        for _ in range(REPS):
            for n, (fn, args) in legs.items():  # interleaved
                acc[n].append(bench_leg(fn, args, ITERS))
        med = {n: float(np.median(v)) for n, v in acc.items()}
        print(f"{i:>5} {t:>6} {ch:>4} | {med.get('xla_pack', 0):>9.2f} "
              f"{med.get('xla_dense', 0):>10.2f} "
              f"{med.get('kernel', float('nan')):>8.2f}", flush=True)


if __name__ == "__main__":
    main()
