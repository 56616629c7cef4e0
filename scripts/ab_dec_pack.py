#!/usr/bin/env python
"""A/B the decoder's channel packing in the TRAINING step, in ONE process.

Round-3 profiling put the training decoder (32-frame slice decode + bwd) at
43%/48% utilization of *executed* FLOPs -- but the space-to-depth packed late
stages execute 1.50x the model MACs (CPU cost_analysis census, round 4), so
model-FLOP efficiency is ~29/32%. Packing was chosen on SERVING shapes
(B=32 x 256k samples, round 2); training shapes (B=16 x 8192-sample slices)
give XLA a large batch dim to tile instead, so the unpacked form may win
there. Same tunnel timing rules as scripts/ab_disc_fold.py (state chaining
varies inputs; host readback as barrier; one process for both variants).

The pack is exact math (nn/conv.py pack_conv_weight), so init losses must
agree bit-for-bit up to bf16 reduction order.

Usage: python scripts/ab_dec_pack.py [frames] [batch] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.data.pipeline import Batch
from smart_vocoder_tpu.models import build_synthesizer
from smart_vocoder_tpu.models.discriminator import MultiPeriodDiscriminator
from smart_vocoder_tpu.training.optim import make_optimizer
from smart_vocoder_tpu.training.step import init_train_state, make_train_step


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hps = load_config(os.path.join(root, "configs", "iitp_base.json"))
    hps.train.batch_size = batch
    hop = hps.data.hop_length
    dtype = jnp.bfloat16

    net_d = MultiPeriodDiscriminator(dtype=dtype)
    tx_g, tx_d = make_optimizer(hps), make_optimizer(hps)

    make = jax.jit(lambda k: Batch(
        spec=jax.random.uniform(k, (batch, frames, 513), jnp.float32, 0.0, 2.0),
        spec_lengths=jnp.full((batch,), frames, jnp.int32),
        wav=jax.random.uniform(k, (batch, frames * hop, 1), jnp.float32, -0.5, 0.5),
        wav_lengths=jnp.full((batch,), frames * hop, jnp.int32),
        sid=None,
    ))
    b = make(jax.random.key(0))

    # Compile BOTH variants first, then time them in interleaved blocks
    # (ABAB...): tunnel throughput drifts over minutes, so sequential
    # leg-after-leg timing confounds the variant with the drift -- the
    # round-4 sequential runs showed a consistent "first leg slower"
    # pattern. Interleaving cancels it; per-block times are printed so any
    # residual drift is visible.
    compiled = {}
    loss0s = {}
    for pack in (True, False):
        hps.tpu.channel_pack = pack
        net_g = build_synthesizer(hps, dtype=dtype)
        print(f"[pack={pack}] init...", flush=True)
        t0 = time.time()
        state = jax.jit(
            lambda k, b: init_train_state(hps, net_g, net_d, tx_g, tx_d, k, b)
        )(jax.random.key(1), b)
        jax.block_until_ready(state.params_g)
        print(f"[pack={pack}] init {time.time() - t0:.1f}s", flush=True)

        step = jax.jit(make_train_step(hps, net_g, net_d, tx_g, tx_d,
                                       donate=False))
        t0 = time.time()
        _, metrics = step(state, b, jax.random.key(2))
        loss0s[pack] = float(metrics["loss/g/total"])
        print(f"[pack={pack}] compile+step {time.time() - t0:.1f}s; "
              f"loss/g/total {loss0s[pack]:.4f}", flush=True)
        compiled[pack] = (step, state)

    blocks = {True: [], False: []}
    n_blocks = 4
    for blk in range(n_blocks):
        for pack in (True, False) if blk % 2 == 0 else (False, True):
            step, st = compiled[pack]
            t0 = time.perf_counter()
            for i in range(iters):
                st, metrics = step(st, b,
                                   jax.random.fold_in(jax.random.key(3),
                                                      blk * iters + i))
            chk = float(metrics["loss/g/total"])  # host fetch = barrier
            dt = (time.perf_counter() - t0) / iters * 1e3
            compiled[pack] = (step, st)
            blocks[pack].append(dt)
            print(f"[blk {blk} pack={pack}] {dt:.1f} ms/step "
                  f"(loss {chk:.3f})", flush=True)

    med = {p: sorted(v)[len(v) // 2] for p, v in blocks.items()}
    print(f"\npack ON median {med[True]:.1f} ms {blocks[True]} | "
          f"pack OFF median {med[False]:.1f} ms {blocks[False]} | "
          f"ON/OFF {med[True] / med[False]:.3f}x | "
          f"init-loss delta {abs(loss0s[True] - loss0s[False]):.5f}")


if __name__ == "__main__":
    main()
