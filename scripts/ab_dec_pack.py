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

    results = {}
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
        loss0 = float(metrics["loss/g/total"])
        print(f"[pack={pack}] compile+step {time.time() - t0:.1f}s; "
              f"loss/g/total {loss0:.4f}", flush=True)

        st = state
        t0 = time.perf_counter()
        for i in range(iters):
            st, metrics = step(st, b, jax.random.fold_in(jax.random.key(3), i))
        chk = float(metrics["loss/g/total"])  # host fetch = barrier
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"[pack={pack}] {dt:.1f} ms/step (loss {chk:.3f})", flush=True)
        results[pack] = (dt, loss0)

    (dt_p, l_p), (dt_u, l_u) = results[True], results[False]
    print(f"\npack ON {dt_p:.1f} ms | pack OFF {dt_u:.1f} ms | "
          f"OFF/ON {dt_p / dt_u:.3f}x | init-loss delta {abs(l_p - l_u):.5f}")


if __name__ == "__main__":
    main()
