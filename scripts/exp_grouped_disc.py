#!/usr/bin/env python
"""Same-process A/B: packed-grouped DiscriminatorS convs vs lax grouped conv.

The xplane profile attributes 14.7 of the 71.7 ms train step to
discriminators_0 (DiscriminatorS) -- ~15 GFLOP/apply running at ~1.8% MXU
utilization because its grouped convs have 4 channels per group. The
space-to-depth GEMM form (NormConv1d._packed_grouped) trades a ~2.3x MAC
inflation for full lanes. Rules per docs: vary inputs per iteration, sync by
host readback, both variants in ONE process, interleaved rounds.

Usage: python scripts/exp_grouped_disc.py [frames] [batch] [iters] [rounds]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.models import MultiPeriodDiscriminator, build_synthesizer
from smart_vocoder_tpu.training import make_optimizer, make_train_step
from smart_vocoder_tpu.training.step import Batch, init_train_state

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
ROUNDS = int(sys.argv[4]) if len(sys.argv) > 4 else 3


def main():
    cfg = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "configs", "iitp_base.json")
    hps = load_config(cfg)
    hps.train.batch_size = BATCH
    hop = hps.data.hop_length

    net_g = build_synthesizer(hps, dtype=jnp.bfloat16)
    tx_g, tx_d = make_optimizer(hps), make_optimizer(hps)

    b = jax.jit(lambda k: Batch(
        spec=jax.random.uniform(k, (BATCH, FRAMES, 513), jnp.float32, 0.0, 2.0),
        spec_lengths=jnp.full((BATCH,), FRAMES, jnp.int32),
        wav=jax.random.uniform(k, (BATCH, FRAMES * hop, 1), jnp.float32, -0.5, 0.5),
        wav_lengths=jnp.full((BATCH,), FRAMES * hop, jnp.int32),
        sid=None,
    ))(jax.random.key(0))

    variants = {}
    for name, packed, pair in [("lax-grouped", False, False),
                               ("packed-GEMM", True, False),
                               ("packed+pair", True, True)]:
        net_d = MultiPeriodDiscriminator(dtype=jnp.bfloat16, pack_grouped=packed,
                                         pair_batched=pair)
        state = jax.jit(
            lambda k, b, d=net_d: init_train_state(hps, net_g, d, tx_g, tx_d, k, b)
        )(jax.random.key(1), b)
        step = jax.jit(make_train_step(hps, net_g, net_d, tx_g, tx_d))
        t0 = time.time()
        _, m = step(state, b, jax.random.key(2))
        print(f"{name}: compile+first {time.time()-t0:.1f}s "
              f"loss {float(m['loss/g/total']):.4f}", flush=True)
        variants[name] = (step, state)

    for r in range(ROUNDS):
        for name, (step, state) in variants.items():
            s = state
            t0 = time.perf_counter()
            for i in range(ITERS):
                s, m = step(s, b, jax.random.fold_in(jax.random.key(3 + r), i))
            chk = float(m["loss/g/total"])  # host readback barrier
            dt = (time.perf_counter() - t0) / ITERS * 1e3
            print(f"round {r} {name:12s}: {dt:7.1f} ms/step (loss {chk:.2f})",
                  flush=True)


if __name__ == "__main__":
    main()
