#!/usr/bin/env python
"""Device-busy per-op breakdown of the GAN train step (VERDICT r2 item 4).

Why not wall-clock sub-graph timing: each tunneled execution carries a
~4-6 ms dispatch overhead, which swamps 1-3 ms subgraphs (profile_train.py
measured several fwd+bwd rows FASTER than their fwd row). This script traces
N full steps with jax.profiler and defers to the xplane's 'XLA Ops' line --
true device time per op -- summarized by scripts/parse_xplane.py.

Usage:
    python scripts/profile_train_xplane.py [frames] [batch] [steps]
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python scripts/parse_xplane.py /tmp/train_xplane <steps> 40
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
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
TRACE_DIR = "/tmp/train_xplane"


def main():
    cfg = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "configs", "iitp_base.json")
    hps = load_config(cfg)
    hps.train.batch_size = BATCH
    hop = hps.data.hop_length

    net_g = build_synthesizer(hps, dtype=jnp.bfloat16)
    net_d = MultiPeriodDiscriminator(dtype=jnp.bfloat16)
    tx_g, tx_d = make_optimizer(hps), make_optimizer(hps)

    b = jax.jit(lambda k: Batch(
        spec=jax.random.uniform(k, (BATCH, FRAMES, 513), jnp.float32, 0.0, 2.0),
        spec_lengths=jnp.full((BATCH,), FRAMES, jnp.int32),
        wav=jax.random.uniform(k, (BATCH, FRAMES * hop, 1), jnp.float32, -0.5, 0.5),
        wav_lengths=jnp.full((BATCH,), FRAMES * hop, jnp.int32),
        sid=None,
    ))(jax.random.key(0))
    state = jax.jit(
        lambda k, b: init_train_state(hps, net_g, net_d, tx_g, tx_d, k, b)
    )(jax.random.key(1), b)
    step = jax.jit(make_train_step(hps, net_g, net_d, tx_g, tx_d), donate_argnums=0)

    t0 = time.time()
    state, metrics = step(state, b, jax.random.key(2))
    print(f"compile+first {time.time()-t0:.1f}s loss {float(metrics['loss/g/total']):.2f}",
          flush=True)
    for i in range(3):
        state, metrics = step(state, b, jax.random.fold_in(jax.random.key(3), i))
    float(metrics["loss/g/total"])

    with jax.profiler.trace(TRACE_DIR):
        for i in range(STEPS):
            state, metrics = step(state, b, jax.random.fold_in(jax.random.key(4), i))
        float(metrics["loss/g/total"])  # host readback inside the trace window
    print(f"traced {STEPS} steps -> {TRACE_DIR}", flush=True)


if __name__ == "__main__":
    main()
