#!/usr/bin/env python
"""Round 2 of the fidelity bisection: WHAT about bf16 hurts at the
waveform-adjacent end (MRF stage 4 + conv_post), per bisect_fidelity.py:
piece-3-bf16 = 0.0133 and post-bf16 = 0.0106 dominate the 0.024 serving
mel-L1, while the FLOP-heavy early stages contribute 0.002-0.0045.

Separates, for the late pieces: weight rounding / activation-storage
rounding / matmul (DEFAULT) rounding / final-waveform output rounding.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.kernels.decoder import (
    DecoderConfig,
    _conv1d,
    _conv_transpose_polyphase,
    _stage_branches,
)
from smart_vocoder_tpu.kernels.mrf import mrf_stage_reference
from smart_vocoder_tpu.models import build_synthesizer
from smart_vocoder_tpu.ops import MelConfig, mel_spectrogram

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
F32, BF16 = jnp.float32, jnp.bfloat16


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def rt(x):  # round-trip through bf16
    return x.astype(BF16).astype(F32)


def dec_knobbed(params_dec, z, cfg, late_weights_bf16=False,
                late_acts_bf16=False, late_matmul_default=False,
                out_bf16=False):
    """All-f32 decoder (caller wraps in 'highest') with independent bf16
    knobs applied ONLY to stage 4 (last MRF stage) + conv_post."""
    num_kernels = len(cfg.resblock_kernel_sizes)
    ks = tuple(cfg.resblock_kernel_sizes)
    dil = tuple(cfg.resblock_dilation_sizes[0])

    def maybe_w(w):
        return rt(w) if late_weights_bf16 else w

    x = _conv1d(z, params_dec["conv_pre"]["weight"], params_dec["conv_pre"]["bias"], 3, F32)
    last = len(cfg.upsample_rates) - 1
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ups = params_dec[f"ups_{i}"]
        branches = _stage_branches(params_dec, i, num_kernels, len(dil), F32)
        late = i == last

        def stage(x):
            br = [tuple(maybe_w(w) for w in b) for b in branches] if late else branches
            uw = maybe_w(ups["weight"]) if late else ups["weight"]
            ub = maybe_w(ups["bias"]) if late else ups["bias"]
            x = jax.nn.leaky_relu(x, 0.1)
            x = _conv_transpose_polyphase(x, uw, ub, k, u, (k - u) // 2, F32)
            if late and late_acts_bf16:
                x = rt(x)
            # per-conv storage rounding inside the MRF needs a custom loop
            if late and late_acts_bf16:
                acc = None
                for (w1, b1, w2, b2), kk in zip(br, ks):
                    xb = x
                    for j, d in enumerate(dil):
                        xt = _convd(jax.nn.leaky_relu(xb, 0.1), w1[j], b1[j], d)
                        xt = rt(xt)
                        xt = _convd(jax.nn.leaky_relu(xt, 0.1), w2[j], b2[j], 1)
                        xt = rt(xt)
                        xb = rt(xt + xb)
                    acc = xb if acc is None else acc + xb
                return acc / len(br)
            return mrf_stage_reference(x, br, ks, dil)

        if late and late_matmul_default:
            with jax.default_matmul_precision("default"):
                x = stage(x)
        else:
            x = stage(x)
    pw = maybe_w(params_dec["conv_post"]["weight"])
    x = jax.nn.leaky_relu(x)
    if late_matmul_default:
        with jax.default_matmul_precision("default"):
            x = _conv1d(x, pw, None, 3, F32)
    else:
        x = _conv1d(x, pw, None, 3, F32)
    x = jnp.tanh(x)
    if late_acts_bf16 or out_bf16:
        x = rt(x)
    return x


def _convd(x, w, b, dilation):
    k = w.shape[0]
    pad = (k * dilation - dilation) // 2
    y = jax.lax.conv_general_dilated(
        x, w, (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + b


def main():
    hps = load_config(os.path.join(ROOT, "configs", "iitp_base.json"))
    gz = np.load(os.path.join(ROOT, "tests", "fixtures", "golden_iitp_base.npz"))
    noise_scale = float(gz["noise_scale"])
    gmel = jnp.asarray(gz["mel"])
    glens = jnp.full((1,), gmel.shape[1], jnp.int32)
    geps = jnp.asarray(gz["eps"])
    gwav = jnp.asarray(gz["wav_ref"])
    mel_cfg = MelConfig.from_hparams(hps)
    cfg = DecoderConfig.from_hparams(hps)

    from smart_vocoder_tpu.utils.golden import fidelity_params

    spec0 = jnp.zeros((1, gmel.shape[1], hps.data.filter_length // 2 + 1))
    params = fidelity_params(hps, gmel, glens, spec0)
    net_f32 = build_synthesizer(hps, weight_norm=False)

    def mel_l1_of(wav):
        m_got = mel_spectrogram(wav[..., 0].astype(F32), mel_cfg)
        m_ref = mel_spectrogram(gwav[None].astype(F32), mel_cfg)
        return jnp.mean(jnp.abs(m_got - m_ref))

    def z_f32(p):
        def fn(n, mel, lens, eps):
            _, m_p, logs_p, mask = n.enc_p(mel, lens)
            z_p = m_p + eps.astype(m_p.dtype) * jnp.exp(logs_p) * noise_scale
            return n.flow(z_p, mask, g=None, reverse=True) * mask
        return net_f32.apply({"params": p}, gmel, glens, geps, method=fn)

    def run(name, **knobs):
        def fn(p):
            with jax.default_matmul_precision("highest"):
                return mel_l1_of(dec_knobbed(p["dec"], z_f32(p), cfg, **knobs))
        v = float(jax.jit(fn)(params))
        log(f"{name:46s} mel_l1 = {v:.5f}")
        return v

    run("R0 all f32/highest (sanity)")
    run("R1 only final wav rounded bf16", out_bf16=True)
    run("R2 late weights bf16", late_weights_bf16=True)
    run("R3 late matmuls DEFAULT", late_matmul_default=True)
    run("R4 late activations stored bf16", late_acts_bf16=True)
    run("R5 late weights+matmul bf16 (acts f32)",
        late_weights_bf16=True, late_matmul_default=True)
    run("R6 all three late knobs (~= piece-3+post bf16)",
        late_weights_bf16=True, late_matmul_default=True, late_acts_bf16=True)


if __name__ == "__main__":
    main()
