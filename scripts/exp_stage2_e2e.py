#!/usr/bin/env python
"""Same-process e2e A/B: current routing vs stages-2..4-contiguous Pallas.

pallas_stage2=True moves the ch=128 MRF onto the unpacked fused kernel
(pack=1, zero Toeplitz inflation; isolated it is ~5 ms SLOWER than XLA) and
folds the ch=64 stage's upsample into its packed kernel (now legal: its
input is a Pallas producer). The bet is that removing the ups_2 XLA op and
any residual layout copies at the XLA/Pallas boundary outweighs the isolated
loss. Tunnel-safe timing (per-iter rng + checksum readback).

Usage: python scripts/exp_stage2_e2e.py [iters]
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

BATCH, FRAMES = 32, 1000
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hps = load_config(os.path.join(root, "configs", "iitp_base.json"))
    dtype = jnp.bfloat16
    net = build_synthesizer(hps, dtype=dtype, weight_norm=False)
    mel = jax.random.normal(jax.random.key(0), (BATCH, FRAMES, 80)) * 2.0 - 4.0
    lens = jnp.full((BATCH,), FRAMES, jnp.int32)
    spec = jnp.zeros((BATCH, FRAMES, 513))

    from smart_vocoder_tpu.utils.golden import fidelity_params

    params = fidelity_params(hps, mel, lens, spec)
    dec_cfg = DecoderConfig.from_hparams(hps)

    def make(pallas_stage2):
        @jax.jit
        def synth(params, mel, lens, rng):
            def prior_latent(n, mel, lens, rng):
                _, m_p, logs_p, mask = n.enc_p(mel, lens)
                eps = jax.random.normal(rng, m_p.shape, jnp.float32).astype(m_p.dtype)
                z_p = m_p + eps * jnp.exp(logs_p) * 0.667
                return n.flow(z_p, mask, g=None, reverse=True) * mask

            z = net.apply({"params": params}, mel, lens, rng, method=prior_latent)
            wav = decoder_apply(params["dec"], z, dec_cfg, use_pallas=True,
                                dtype=dtype, pallas_stage2=pallas_stage2)
            return wav, jnp.sum(wav.astype(jnp.float32))
        return synth

    def timeit(synth, label):
        rng = jax.random.key(3)
        t0 = time.time()
        out, chk = synth(params, mel, lens, rng)
        print(f"{label}: compile {time.time()-t0:.1f}s chk {float(chk):.1f}",
              flush=True)
        for i in range(3):
            out, chk = synth(params, mel, lens, jax.random.fold_in(rng, i))
        float(chk)
        t0 = time.perf_counter()
        for i in range(ITERS):
            out, chk = synth(params, mel, lens, jax.random.fold_in(rng, 100 + i))
        float(chk)
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{label}: {ms:.2f} ms/step", flush=True)
        return ms

    a = make(False)
    b = make(True)
    # parity first (same rng -> same prior; decoder paths must agree closely)
    wa, _ = a(params, mel, lens, jax.random.key(9))
    wb, _ = b(params, mel, lens, jax.random.key(9))
    diff = float(jnp.max(jnp.abs(wa.astype(jnp.float32) - wb.astype(jnp.float32))))
    print(f"max |a-b| = {diff:.5f}", flush=True)

    ms_a = timeit(a, "current routing   ")
    ms_b = timeit(b, "stages2-4 pallas  ")
    ms_a2 = timeit(a, "current (re-run)  ")
    print(f"delta: {ms_b - (ms_a + ms_a2) / 2:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
