#!/usr/bin/env python
"""Dump the compiled (optimized) HLO text of the GAN train step.

Companion to profile_train_xplane.py: the xplane's 'XLA Ops' events carry
only HLO instruction names; the optimized module text carries each
instruction's `metadata={op_name="jit(train_step)/..."}` source path (flax
module scopes). scripts/train_phase_profile.py joins the two to attribute
device time to model phases.

Usage: python scripts/dump_train_hlo.py [frames] [batch] [out.txt]
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
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/train_hlo.txt"


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
    compiled = step.lower(state, b, jax.random.key(2)).compile()
    text = compiled.as_text()
    with open(OUT, "w") as f:
        f.write(text)
    print(f"compile {time.time()-t0:.1f}s; {len(text.splitlines())} HLO lines -> {OUT}",
          flush=True)


if __name__ == "__main__":
    main()
