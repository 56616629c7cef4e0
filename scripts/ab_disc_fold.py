#!/usr/bin/env python
"""A/B the DiscriminatorP period-fold inside ONE process.

Builds two full GAN train steps over identical generator params -- one with
``fold_period=True`` (period axis folded into batch, 1-D convs along H) and
one with the reference layout (NHWC, W=p) -- and times both in the same
process per the tunnel timing rules (vary inputs per iter, host readback as
the completion barrier; see memory: per-process throughput varies ~2x, so
cross-process comparisons are meaningless).

Also asserts the two variants' init losses agree (the fold is exact: same
params, same logits, fmaps permuted only -- losses are means).

Usage: python scripts/ab_disc_fold.py [frames] [batch] [iters]
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

    net_g = build_synthesizer(hps, dtype=dtype)
    tx_g, tx_d = make_optimizer(hps), make_optimizer(hps)

    make = jax.jit(lambda k: Batch(
        spec=jax.random.uniform(k, (batch, frames, 513), jnp.float32, 0.0, 2.0),
        spec_lengths=jnp.full((batch,), frames, jnp.int32),
        wav=jax.random.uniform(k, (batch, frames * hop, 1), jnp.float32, -0.5, 0.5),
        wav_lengths=jnp.full((batch,), frames * hop, jnp.int32),
        sid=None,
    ))
    b = make(jax.random.key(0))

    # Compile both variants, then time interleaved blocks (ABAB...) --
    # tunnel throughput drifts over minutes, so sequential legs confound
    # the variant with the drift (see scripts/ab_dec_pack.py).
    compiled = {}
    loss0s = {}
    for fold in (True, False):
        net_d = MultiPeriodDiscriminator(dtype=dtype, fold_period=fold)
        print(f"[fold={fold}] init...", flush=True)
        t0 = time.time()
        state = jax.jit(
            lambda k, b: init_train_state(hps, net_g, net_d, tx_g, tx_d, k, b)
        )(jax.random.key(1), b)
        jax.block_until_ready(state.params_d)
        print(f"[fold={fold}] init {time.time() - t0:.1f}s", flush=True)

        step = jax.jit(make_train_step(hps, net_g, net_d, tx_g, tx_d,
                                       donate=False))
        t0 = time.time()
        _, metrics = step(state, b, jax.random.key(2))
        loss0s[fold] = float(metrics["loss/g/total"])
        print(f"[fold={fold}] compile+step {time.time() - t0:.1f}s; "
              f"loss/g/total {loss0s[fold]:.4f}", flush=True)
        compiled[fold] = (step, state)

    blocks = {True: [], False: []}
    for blk in range(4):
        for fold in (True, False) if blk % 2 == 0 else (False, True):
            step, st = compiled[fold]
            t0 = time.perf_counter()
            for i in range(iters):
                st, metrics = step(st, b,
                                   jax.random.fold_in(jax.random.key(3),
                                                      blk * iters + i))
            chk = float(metrics["loss/g/total"])  # host fetch = barrier
            dt = (time.perf_counter() - t0) / iters * 1e3
            compiled[fold] = (step, st)
            blocks[fold].append(dt)
            print(f"[blk {blk} fold={fold}] {dt:.1f} ms/step "
                  f"(loss {chk:.3f})", flush=True)

    med = {f: sorted(v)[len(v) // 2] for f, v in blocks.items()}
    print(f"\nfold ON median {med[True]:.1f} ms {blocks[True]} | "
          f"fold OFF median {med[False]:.1f} ms {blocks[False]} | "
          f"ON/OFF {med[True] / med[False]:.3f}x | "
          f"init-loss delta {abs(loss0s[True] - loss0s[False]):.5f}")
    assert abs(loss0s[True] - loss0s[False]) < 0.05, \
        "fold changed the init loss -- NOT exact"


if __name__ == "__main__":
    main()
