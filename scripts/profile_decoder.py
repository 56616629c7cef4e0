#!/usr/bin/env python
"""Per-stage decoder profile on the serving graph, tunnel-safe.

Times cumulative *prefixes* of the real bench pipeline (prior+flow, then
upsample+MRF stages 1..k, then conv_post) and reports the differences as
per-stage cost. Methodology notes (both measured on the tunneled v5e):

- identical-input executions are short-circuited by the backend, so every
  iteration folds a fresh rng (this script's predecessor timed repeats of
  one input and produced fiction);
- ``block_until_ready`` is not a reliable completion barrier here -- each
  timed loop ends with a host readback (``float``) of an in-graph checksum.

Usage: python scripts/profile_decoder.py [batch] [frames] [iters] [--no-pallas]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.kernels.decoder import DecoderConfig, decoder_apply
from smart_vocoder_tpu.models import build_synthesizer
from smart_vocoder_tpu.nn import fold_weight_norm

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
BATCH = int(_pos[0]) if len(_pos) > 0 else 32
FRAMES = int(_pos[1]) if len(_pos) > 1 else 1000
ITERS = int(_pos[2]) if len(_pos) > 2 else 15
# comma-separated prefix list (e.g. "-1,1,2"); each prefix compiles a big
# graph over the tunnel, so splitting across runs dodges wall-clock limits
PREFIXES = (tuple(int(s) for s in _pos[3].split(","))
            if len(_pos) > 3 else (-1, 1, 2, 3, 4, 5))
USE_PALLAS = "--no-pallas" not in sys.argv
HIFI = "--hifi" in sys.argv  # serving-fidelity islands (stages 3+4, kernels/mrf.py)


def main():
    hps = load_config(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "iitp_base.json"))
    net = build_synthesizer(hps, dtype=jnp.bfloat16, weight_norm=False)
    net_wn = build_synthesizer(hps, weight_norm=True)
    dec_cfg = DecoderConfig.from_hparams(hps)

    mel = jax.random.normal(jax.random.key(0), (BATCH, FRAMES, 80)) * 2.0 - 4.0
    lens = jnp.full((BATCH,), FRAMES, jnp.int32)
    spec = jnp.zeros((BATCH, FRAMES, hps.data.filter_length // 2 + 1))
    params = jax.jit(lambda k1, k2: fold_weight_norm(
        net_wn.init(k1, mel, lens, spec, lens, k2)["params"]))(
        jax.random.key(1), jax.random.key(2))

    def make_prefix(stages):
        """stages: -1 = prior+flow only; 1..4 = + that many decoder stages
        (4 stops before conv_post); 5 = full pipeline incl. conv_post."""
        @jax.jit
        def f(params, mel, lens, rng):
            def prior_latent(n, mel, lens, rng):
                _, m_p, logs_p, mask = n.enc_p(mel, lens)
                eps = jax.random.normal(rng, m_p.shape, jnp.float32).astype(m_p.dtype)
                z_p = m_p + eps * jnp.exp(logs_p) * 0.667
                return n.flow(z_p, mask, g=None, reverse=True) * mask

            z = net.apply({"params": params}, mel, lens, rng, method=prior_latent)
            if stages == -1:
                return jnp.sum(z.astype(jnp.float32))
            out = decoder_apply(params["dec"], z, dec_cfg, use_pallas=USE_PALLAS,
                                max_stages=None if stages >= 5 else stages,
                                hifi_tail=HIFI)
            return jnp.sum(out.astype(jnp.float32))
        return f

    def timeit(f):
        rng = jax.random.key(7)
        float(f(params, mel, lens, rng))
        for i in range(3):
            chk = f(params, mel, lens, jax.random.fold_in(rng, i))
        float(chk)
        t0 = time.perf_counter()
        for i in range(ITERS):
            chk = f(params, mel, lens, jax.random.fold_in(rng, 100 + i))
        float(chk)
        return (time.perf_counter() - t0) / ITERS * 1e3

    labels = {-1: "prior+flow", 1: "stage1 (ch256, T8k)", 2: "stage2 (ch128, T64k)",
              3: "stage3 (ch64, T128k)", 4: "stage4 (ch32, T256k)", 5: "conv_post+tanh"}
    prev = None
    print(f"B={BATCH} T={FRAMES} pallas={USE_PALLAS} iters={ITERS}", flush=True)
    for s in PREFIXES:
        ms = timeit(make_prefix(s))
        delta = f"  (+{ms - prev:7.2f})" if prev is not None else ""
        print(f"prefix<= {labels[s]:22s}: {ms:8.2f} ms{delta}", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
