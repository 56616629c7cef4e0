#!/usr/bin/env python
"""Same-process speed + fidelity A/B of the hifi-tail serving config.

Candidate (VERDICT r2 item 1): bf16 prior/flow + bf16 Pallas decoder stages
1-3 + HIFI final stage (f32 activations, 2-pass bf16 matmuls, f32 waveform).
Target: mel-L1 vs torch golden <= 1e-2 on the exact timed path, RTF >= 1500x.

Usage: python scripts/exp_hifi_tail.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.kernels.decoder import DecoderConfig, decoder_apply
from smart_vocoder_tpu.models import build_synthesizer
from smart_vocoder_tpu.ops import MelConfig, mel_spectrogram

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
    mel_cfg = MelConfig.from_hparams(hps)

    def prior_latent(n, mel, lens, rng):
        _, m_p, logs_p, mask = n.enc_p(mel, lens)
        eps = jax.random.normal(rng, m_p.shape, jnp.float32).astype(m_p.dtype)
        z_p = m_p + eps * jnp.exp(logs_p) * 0.667
        return n.flow(z_p, mask, g=None, reverse=True) * mask

    def make(hifi):
        @jax.jit
        def synth(params, mel, lens, rng):
            z = net.apply({"params": params}, mel, lens, rng, method=prior_latent)
            wav = decoder_apply(params["dec"], z, dec_cfg, use_pallas=True,
                                dtype=dtype, hifi_tail=hifi)
            return wav, jnp.sum(wav.astype(jnp.float32))
        return synth

    def timeit(synth, label):
        rng = jax.random.key(3)
        t0 = time.time()
        out, chk = synth(params, mel, lens, rng)
        print(f"{label}: compile {time.time()-t0:.1f}s out {out.dtype} "
              f"chk {float(chk):.1f}", flush=True)
        for i in range(3):
            out, chk = synth(params, mel, lens, jax.random.fold_in(rng, i))
        float(chk)
        t0 = time.perf_counter()
        for i in range(ITERS):
            out, chk = synth(params, mel, lens, jax.random.fold_in(rng, 100 + i))
        float(chk)
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        rtf = BATCH * FRAMES * 256 / 22050 / (ms / 1e3)
        print(f"{label}: {ms:.2f} ms/step = {rtf:.0f}x RT", flush=True)
        return ms

    # fidelity on the golden fixture through each path
    gz = np.load(os.path.join(root, "tests", "fixtures", "golden_iitp_base.npz"))
    gmel = jnp.asarray(gz["mel"])
    glens = jnp.full((1,), gmel.shape[1], jnp.int32)
    geps = jnp.asarray(gz["eps"])
    gwav = jnp.asarray(gz["wav_ref"])
    noise_scale = float(gz["noise_scale"])

    def fid(hifi):
        @jax.jit
        def f(params):
            def pl_(n, mel, lens, eps):
                _, m_p, logs_p, mask = n.enc_p(mel, lens)
                z_p = m_p + eps.astype(m_p.dtype) * jnp.exp(logs_p) * noise_scale
                return n.flow(z_p, mask, g=None, reverse=True) * mask
            z = net.apply({"params": params}, gmel, glens, geps, method=pl_)
            wav = decoder_apply(params["dec"], z, dec_cfg, use_pallas=True,
                                dtype=dtype, hifi_tail=hifi)
            with jax.default_matmul_precision("highest"):
                m_got = mel_spectrogram(wav[..., 0].astype(jnp.float32), mel_cfg)
                m_ref = mel_spectrogram(gwav[None].astype(jnp.float32), mel_cfg)
            return jnp.mean(jnp.abs(m_got - m_ref))
        return float(f(params))

    print(f"mel_l1 bf16 path : {fid(False):.5f}", flush=True)
    print(f"mel_l1 hifi tail : {fid(True):.5f}", flush=True)

    a = make(False)
    b = make(True)
    ms_a = timeit(a, "bf16 path  ")
    ms_b = timeit(b, "hifi tail  ")
    ms_a2 = timeit(a, "bf16 re-run")
    print(f"hifi cost: {ms_b - (ms_a + ms_a2) / 2:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
