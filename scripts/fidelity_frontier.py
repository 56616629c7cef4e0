#!/usr/bin/env python
"""Serving RTF-vs-fidelity frontier (VERDICT r4 item 3 / next #3).

One process, one parameter set (utils/golden.fidelity_params -- the weights
the committed torch-reference golden fixture was generated from), five
operating points of the SAME serving path, differing only in where the
f32 islands sit (kernels/decoder.py hifi_tail ladder + prior precision):

  level 0 : pure bf16 Pallas path ("--fast" in bench.py)
  level 1 : + stage-4 two-pass hi/lo matmuls + stage-3/4 f32 activations
            (the round-3/4 headline)
  level 2 : + early-decoder f32 storage (conv_pre/ups/XLA MRF stages,
            single-bf16 MXU operands) + f32 prior+flow -- the round-5
            bench.py headline
  level 3 : + stage-3 two-pass hi/lo matmuls (measured dominated)
  f32     : full f32 through the module graph (no Pallas), matmul DEFAULT

For each point: ms/step and RTF under the bench.py protocol (B=32, 1000
frames), and mel-L1 vs the torch reference's f32 waveform on the golden
fixture.  Timing blocks are interleaved across points (tunnel drift
cancellation); fidelity is computed once per point.

Usage: python scripts/fidelity_frontier.py [reps] [iters]
"""

import json
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
from smart_vocoder_tpu.models.synthesizer import SynthesizerTrn
from smart_vocoder_tpu.ops import MelConfig, mel_spectrogram

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BATCH, FRAMES = 32, 1000
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    hps = load_config(os.path.join(ROOT, "configs", "iitp_base.json"))
    from smart_vocoder_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(hps.tpu.get("compilation_cache", True))
    sr, hop = hps.data.sampling_rate, hps.data.hop_length
    dec_cfg = DecoderConfig.from_hparams(hps)
    mel_cfg = MelConfig.from_hparams(hps)

    mel = jax.random.normal(jax.random.key(0), (BATCH, FRAMES, 80)) * 2.0 - 4.0
    lens = jnp.full((BATCH,), FRAMES, jnp.int32)
    spec = jnp.zeros((BATCH, FRAMES, hps.data.filter_length // 2 + 1))
    from smart_vocoder_tpu.utils.golden import fidelity_params
    params = fidelity_params(hps, mel, lens, spec)

    gz = np.load(os.path.join(ROOT, "tests", "fixtures", "golden_iitp_base.npz"))
    gmel, geps = jnp.asarray(gz["mel"]), jnp.asarray(gz["eps"])
    glens = jnp.full((1,), gmel.shape[1], jnp.int32)
    gwav = jnp.asarray(gz["wav_ref"])
    noise_scale = float(gz["noise_scale"])

    def mel_l1_of(wav):
        m_got = mel_spectrogram(wav[..., 0].astype(jnp.float32), mel_cfg)
        m_ref = mel_spectrogram(gwav[None].astype(jnp.float32), mel_cfg)
        return jnp.mean(jnp.abs(m_got - m_ref))

    def make_point(dtype, level, prior_f32=False, batch_override=None):
        net = build_synthesizer(hps, dtype=dtype, weight_norm=False)
        net_prior = (build_synthesizer(hps, weight_norm=False)
                     if prior_f32 else net)

        def prior_latent(n, mel, lens, eps):
            _, m_p, logs_p, mask = n.enc_p(mel, lens)
            z_p = m_p + eps.astype(m_p.dtype) * jnp.exp(logs_p) * noise_scale
            return n.flow(z_p, mask, g=None, reverse=True) * mask

        pallas = dtype == jnp.bfloat16

        @jax.jit
        def synth(params, mel, lens, rng):
            if pallas:
                def prior_rng(n, mel, lens, rng):
                    _, m_p, logs_p, mask = n.enc_p(mel, lens)
                    eps = jax.random.normal(rng, m_p.shape, jnp.float32).astype(m_p.dtype)
                    z_p = m_p + eps * jnp.exp(logs_p) * 0.667
                    return n.flow(z_p, mask, g=None, reverse=True) * mask

                z = net_prior.apply({"params": params}, mel, lens, rng,
                                    method=prior_rng)
                wav = decoder_apply(params["dec"], z, dec_cfg, use_pallas=True,
                                    dtype=dtype, hifi_tail=level)
            else:
                wav, _, _ = net.apply(
                    {"params": params}, mel, lens, rng,
                    noise_scale=0.667, method=SynthesizerTrn.infer)
            return wav, jnp.sum(wav.astype(jnp.float32))

        @jax.jit
        def fid(params, gmel, glens, geps):
            if pallas:
                z = net_prior.apply({"params": params}, gmel, glens, geps,
                                    method=prior_latent)
                wav = decoder_apply(params["dec"], z, dec_cfg, use_pallas=True,
                                    dtype=dtype, hifi_tail=level)
            else:
                wav, _, _ = net.apply(
                    {"params": params}, gmel, glens, jax.random.key(0),
                    noise_scale=noise_scale, eps=geps,
                    method=SynthesizerTrn.infer)
            return mel_l1_of(wav)

        return synth, fid

    # (name, dtype, level, prior_f32, batch). The f32 module-graph point OOMs
    # at B=32 (41 GB HBM); time it at B=8 and report per-sample RTF scaled to
    # B=32-equivalent audio -- an upper bound on its real B=32 RTF (less
    # batch parallelism), which is all the frontier needs from it.
    points = [
        ("bf16-fast(l0)", jnp.bfloat16, 0, False, BATCH),
        ("tail(l1)", jnp.bfloat16, 1, False, BATCH),
        ("l2+priorF32", jnp.bfloat16, 2, True, BATCH),   # the headline
        ("l3(s3x2)+priorF32", jnp.bfloat16, 3, True, BATCH),
        ("f32", jnp.float32, 0, False, 8),
    ]
    built = {}
    for name, dtype, level, pf32, bsz in points:
        synth, fid = make_point(dtype, level, prior_f32=pf32)
        log(f"compile {name} ...")
        t0 = time.time()
        _, chk = synth(params, mel[:bsz], lens[:bsz], jax.random.key(3))
        float(chk)
        l1 = float(fid(params, gmel, glens, geps))
        built[name] = (synth, l1, bsz)
        log(f"  compiled in {time.time() - t0:.0f}s, mel_l1={l1:.5f}")

    acc = {n: [] for n in built}
    for _ in range(REPS):
        for name, (synth, _, bsz) in built.items():  # interleave points
            t0 = time.perf_counter()
            for i in range(ITERS):
                _, chk = synth(params, mel[:bsz], lens[:bsz],
                               jax.random.key(3 + i))
            float(chk)  # readback sync
            acc[name].append((time.perf_counter() - t0) / ITERS)

    print(f"{'point':>16} {'ms/step':>8} {'RTF':>7} {'mel_l1':>8}")
    rows = []
    for name, (_, l1, bsz) in built.items():
        dt = float(np.median(acc[name]))
        rtf = bsz * FRAMES * hop / sr / dt
        print(f"{name:>16} {dt * 1e3:>8.1f} {rtf:>7.0f} {l1:>8.5f}"
              + (f"  [B={bsz}]" if bsz != BATCH else ""))
        rows.append({"point": name, "ms": round(dt * 1e3, 1), "batch": bsz,
                     "rtf": round(rtf, 1), "mel_l1": round(l1, 5)})
    print(json.dumps({"frontier": rows}))


if __name__ == "__main__":
    main()
