#!/usr/bin/env python
"""Full GAN training-step benchmark on the real chip (BASELINE configs #4/#5).

Usage: python scripts/bench_train.py [frames] [batch] [iters]
Defaults mirror the config of record: batch 16, bf16 compute, full-size model,
a 1000-frame bucket. Reports step time, steps/sec, and audio-seconds/sec.
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


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    cfg = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "configs", "iitp_base.json")
    hps = load_config(cfg)
    from smart_vocoder_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(hps.tpu.get("compilation_cache", True))
    hps.train.batch_size = batch
    hop = hps.data.hop_length

    dtype = jnp.bfloat16
    net_g = build_synthesizer(hps, dtype=dtype, training=True)
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
    print("init...", flush=True)
    t0 = time.time()
    # jit the whole init: op-by-op execution is pathologically slow (and
    # occasionally hangs) over the tunneled backend
    state = jax.jit(
        lambda k, b: init_train_state(hps, net_g, net_d, tx_g, tx_d, k, b)
    )(jax.random.key(1), b)
    jax.block_until_ready(state.params_g)
    print(f"init {time.time()-t0:.1f}s; params_g "
          f"{sum(x.size for x in jax.tree.leaves(state.params_g)):,}", flush=True)

    step = jax.jit(make_train_step(hps, net_g, net_d, tx_g, tx_d), donate_argnums=0)
    t0 = time.time()
    state, metrics = step(state, b, jax.random.key(2))
    chk = float(metrics["loss/g/total"])
    print(f"compile+first step {time.time()-t0:.1f}s; loss/g/total {chk:.2f}", flush=True)

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, b, jax.random.fold_in(jax.random.key(3), i))
    chk = float(metrics["loss/g/total"])  # host fetch = completion barrier
    dt = (time.perf_counter() - t0) / iters
    audio_sec = batch * frames * hop / hps.data.sampling_rate
    print(f"train step: {dt*1e3:.1f} ms (batch {batch} x {frames} frames, "
          f"{audio_sec:.1f}s audio/step, {audio_sec/dt:.0f}x realtime ingest, "
          f"loss {chk:.2f})", flush=True)

    # MFU vs v5e bf16 peak, on analytic model FLOPs (utils/flops.py; bwd
    # counted as 2x fwd -- packing variants inflate executed MACs and are
    # deliberately NOT counted). NOTE: wall time over the tunnel includes
    # ~4-6 ms dispatch overhead; device-busy MFU (the honest number) needs
    # the xplane profile (scripts/profile_train_xplane.py).
    from smart_vocoder_tpu.utils.flops import V5E_BF16_PEAK, train_step_flops

    fl = train_step_flops(hps, batch, frames)
    import json

    print(json.dumps({
        "metric": "train_step_ms", "value": round(dt * 1e3, 2), "unit": "ms",
        "audio_x_realtime": round(audio_sec / dt, 1),
        "model_tflops_per_step": round(fl / 1e12, 3),
        "achieved_tflops_per_s": round(fl / dt / 1e12, 2),
        "mfu_wallclock": round(fl / dt / V5E_BF16_PEAK, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
