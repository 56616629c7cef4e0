#!/usr/bin/env python
"""Round 3 of the fidelity bisection: where does the REMAINING serving
mel-L1 (0.00865 at hifi level 1, 0.00861 with stage-3 x2 matmuls) come from?
(NOTE: this script's measurements used the PRE-round-5 level ladder, where
level 2 meant stage-3 x2; that point is level 3 after the re-laddering.)

bisect_fidelity/2 attributed the original 0.024 to the waveform-adjacent
tail (stage-4 + conv_post bf16), which hifi level 1 fixed. Level 2
(stage-3 two-pass matmuls) buys only 4e-5 more, so the residual must sit
either in the PRIOR path (enc_p + flow, bf16, ~7% of step time) or in the
early decoder (conv_pre/ups/stages 0-2 bf16). This script splits exactly
that, on the committed golden fixture (B=1, 200 frames; fidelity only,
no timing):

  serve_l1     : bf16 prior + Pallas decoder hifi level 1   (the headline)
  serve_l2     : bf16 prior + Pallas decoder hifi level 2
  priorF32_l1  : f32/highest prior + SAME bf16 level-1 decoder
  priorF32_l2  : f32/highest prior + level-2 decoder
  prior_bf16_decF32 : bf16 prior + all-f32 XLA decoder (no Pallas)
  all_f32      : f32/highest everywhere (the 4e-5 anchor)

Usage: python scripts/bisect_fidelity3.py
"""

import os
import sys

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


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    hps = load_config(os.path.join(ROOT, "configs", "iitp_base.json"))
    from smart_vocoder_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(hps.tpu.get("compilation_cache", True))
    dec_cfg = DecoderConfig.from_hparams(hps)
    mel_cfg = MelConfig.from_hparams(hps)

    mel = jax.random.normal(jax.random.key(0), (1, 200, 80)) * 2.0 - 4.0
    lens = jnp.full((1,), 200, jnp.int32)
    spec = jnp.zeros((1, 200, hps.data.filter_length // 2 + 1))
    from smart_vocoder_tpu.utils.golden import fidelity_params
    params = fidelity_params(hps, mel, lens, spec)

    gz = np.load(os.path.join(ROOT, "tests", "fixtures", "golden_iitp_base.npz"))
    gmel, geps = jnp.asarray(gz["mel"]), jnp.asarray(gz["eps"])
    glens = jnp.full((1,), gmel.shape[1], jnp.int32)
    gwav = jnp.asarray(gz["wav_ref"])
    noise_scale = float(gz["noise_scale"])

    net_bf16 = build_synthesizer(hps, dtype=jnp.bfloat16, weight_norm=False)
    net_f32 = build_synthesizer(hps, weight_norm=False)

    def mel_l1_of(wav):
        m_got = mel_spectrogram(wav[..., 0].astype(jnp.float32), mel_cfg)
        m_ref = mel_spectrogram(gwav[None].astype(jnp.float32), mel_cfg)
        return jnp.mean(jnp.abs(m_got - m_ref))

    def prior_latent(n, mel, lens, eps):
        _, m_p, logs_p, mask = n.enc_p(mel, lens)
        z_p = m_p + eps.astype(m_p.dtype) * jnp.exp(logs_p) * noise_scale
        return n.flow(z_p, mask, g=None, reverse=True) * mask

    def prior(f32: bool):
        if f32:
            with jax.default_matmul_precision("highest"):
                z = net_f32.apply({"params": params}, gmel, glens, geps,
                                  method=prior_latent)
            return z
        return net_bf16.apply({"params": params}, gmel, glens, geps,
                              method=prior_latent)

    def serve(prior_f32: bool, level: int):
        @jax.jit
        def run():
            z = prior(prior_f32)
            return mel_l1_of(decoder_apply(params["dec"], z.astype(jnp.bfloat16),
                                           dec_cfg, use_pallas=True,
                                           dtype=jnp.bfloat16, hifi_tail=level))
        return run()

    @jax.jit
    def dec_f32():
        z = prior(False)
        with jax.default_matmul_precision("highest"):
            return mel_l1_of(decoder_apply(params["dec"], z.astype(jnp.float32),
                                           dec_cfg, use_pallas=False,
                                           dtype=jnp.float32))

    @jax.jit
    def all_f32():
        with jax.default_matmul_precision("highest"):
            wav, _, _ = net_f32.apply(
                {"params": params}, gmel, glens, jax.random.key(0),
                noise_scale=noise_scale, eps=geps, method=SynthesizerTrn.infer)
            return mel_l1_of(wav)

    for name, fn in [
        ("serve_l1", lambda: serve(False, 1)),
        ("serve_l2", lambda: serve(False, 2)),
        ("priorF32_l1", lambda: serve(True, 1)),
        ("priorF32_l2", lambda: serve(True, 2)),
        ("prior_bf16_decF32", dec_f32),
        ("all_f32", all_f32),
    ]:
        log(f"{name:>18s}: mel_l1 = {float(fn()):.5f}")


if __name__ == "__main__":
    main()
