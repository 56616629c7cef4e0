#!/usr/bin/env python
"""Same-process A/B: hifi level 1 vs 2 at WINDOW shapes (live-TTS serving).

The round-5 headline (hifi level 2: early-decoder f32 storage + f32 prior)
was adopted on the B=32 x 1000-frame batched-offline shape (+19.6 ms there,
scripts/fidelity_frontier.py). Window decodes are a different operating
point -- small T, batch 1..32, dispatch-bound -- so the level choice for
StreamServer/stream_mel_to_wav must be measured at window shapes, not
assumed. Interleaved timing (tunnel-drift cancellation):

  B=1 single window (chunk 384 and 1024), and an 8-stream StreamServer
  step at chunk 384, for each level.

Usage: python scripts/ab_window_hifi.py [reps] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.inference import Vocoder
from smart_vocoder_tpu.serving import StreamServer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 15


def log(m):
    print(m, flush=True)


def main():
    hps = load_config(os.path.join(ROOT, "configs", "iitp_base.json"))
    from smart_vocoder_tpu.utils.golden import fidelity_params
    mel0 = jnp.zeros((1, 64, 80))
    lens0 = jnp.full((1,), 64, jnp.int32)
    spec0 = jnp.zeros((1, 64, 513))
    params = fidelity_params(hps, mel0, lens0, spec0)

    vocs = {lvl: Vocoder(hps, params, dtype=jnp.bfloat16,
                         buckets=(384, 1024), fold=True, use_pallas=True,
                         hifi=lvl)
            for lvl in (1, 2)}

    rng = np.random.default_rng(0)
    legs = []  # (name, fn) -> fn() must end in a host readback

    for lvl, voc in vocs.items():
        for chunk in (384, 1024):
            mel = rng.normal(-4, 2, (chunk, 80)).astype(np.float32)

            def leg(voc=voc, mel=mel, chunk=chunk):
                def run(i):
                    return voc._synth_window(mel + i * 1e-3, i, chunk,
                                             0.667, None, i)
                return run
            legs.append((f"l{lvl} B=1 chunk={chunk}", leg()))

        server = StreamServer(vocs[lvl], max_streams=8, chunk=384, overlap=96)
        handles = [server.open(seed=i) for i in range(8)]
        need = (4 + REPS * ITERS + 2) * 192 + 384
        for h in handles:
            server.feed(h, rng.normal(-4, 2, (need, 80)).astype(np.float32))

        def sleg(server=server):
            def run(i):
                return server.step()
            return run
        legs.append((f"l{lvl} N=8 chunk=384", sleg()))

    # compile + settle
    for name, fn in legs:
        t0 = time.perf_counter()
        fn(0)
        fn(1)
        log(f"compiled {name} in {time.perf_counter() - t0:.1f}s")

    acc = {n: [] for n, _ in legs}
    for r in range(REPS):
        for name, fn in legs:
            t0 = time.perf_counter()
            for i in range(ITERS):
                fn(10 + r * ITERS + i)
            acc[name].append((time.perf_counter() - t0) / ITERS)

    for name, _ in legs:
        ms = [f"{v * 1e3:.1f}" for v in acc[name]]
        log(f"{name:>22s}: median {np.median(acc[name]) * 1e3:7.1f} ms  "
            f"(reps: {', '.join(ms)})")


if __name__ == "__main__":
    main()
