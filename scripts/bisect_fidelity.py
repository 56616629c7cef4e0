#!/usr/bin/env python
"""Bisect where the bf16 serving path's mel-L1 deviation is born.

Round-2 close: the timed bench path (bf16 + Pallas) measured mel-L1 0.024 vs
the torch-reference golden while f32/highest measured 4e-5 (BENCH_r02.json).
VERDICT round-2 item 1 asks for ONE config that is both >=1500x and <=1e-2;
this script measures the mel-L1 of a ladder of mixed-precision variants so
the f32 islands can be placed where the error actually comes from.

Usage: python scripts/bisect_fidelity.py            (runs the whole ladder)
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
    decoder_apply,
)
from smart_vocoder_tpu.kernels.mrf import mrf_stage_reference
from smart_vocoder_tpu.models import build_synthesizer
from smart_vocoder_tpu.ops import MelConfig, mel_spectrogram

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def prior_latent(net, params, mel, lens, eps, noise_scale):
    def fn(n, mel, lens, eps):
        _, m_p, logs_p, mask = n.enc_p(mel, lens)
        z_p = m_p + eps.astype(m_p.dtype) * jnp.exp(logs_p) * noise_scale
        return n.flow(z_p, mask, g=None, reverse=True) * mask

    return net.apply({"params": params}, mel, lens, eps, method=fn)


def dec_mixed(params_dec, z, cfg: DecoderConfig, stage_dtypes):
    """XLA decoder with per-piece dtype: stage_dtypes maps
    'pre', 0..3, 'post' -> dtype. f32 pieces run at matmul 'highest'
    (set by the caller's context); bf16 pieces cast in and out."""
    num_kernels = len(cfg.resblock_kernel_sizes)
    ks = tuple(cfg.resblock_kernel_sizes)
    dil = tuple(cfg.resblock_dilation_sizes[0])

    dt = stage_dtypes["pre"]
    x = _conv1d(z.astype(dt), params_dec["conv_pre"]["weight"],
                params_dec["conv_pre"]["bias"], 3, dt)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        dt = stage_dtypes[i]
        x = x.astype(dt)
        ups = params_dec[f"ups_{i}"]
        branches = _stage_branches(params_dec, i, num_kernels, len(dil), dt)
        x = jax.nn.leaky_relu(x, 0.1)
        x = _conv_transpose_polyphase(x, ups["weight"].astype(dt),
                                      ups["bias"].astype(dt), k, u, (k - u) // 2, dt)
        x = mrf_stage_reference(x, branches, ks, dil)
    dt = stage_dtypes["post"]
    x = jax.nn.leaky_relu(x.astype(dt))
    x = _conv1d(x, params_dec["conv_post"]["weight"].astype(dt), None, 3, dt)
    return jnp.tanh(x)


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
    net_bf16 = build_synthesizer(hps, dtype=jnp.bfloat16, weight_norm=False)

    def mel_l1_of(wav):
        m_got = mel_spectrogram(wav[..., 0].astype(jnp.float32), mel_cfg)
        m_ref = mel_spectrogram(gwav[None].astype(jnp.float32), mel_cfg)
        return jnp.mean(jnp.abs(m_got - m_ref))

    F32, BF16 = jnp.float32, jnp.bfloat16

    def run(name, fn):
        with jax.default_matmul_precision("highest"):
            v = float(jax.jit(fn)(params))
        log(f"{name:44s} mel_l1 = {v:.5f}")
        return v

    # Priors in each storage dtype (highest precision ctx only affects f32)
    def z_f32(params):
        return prior_latent(net_f32, params, gmel, glens, geps, noise_scale)

    def z_bf16(params):
        return prior_latent(net_bf16, params, gmel, glens, geps, noise_scale)

    all_f32 = {"pre": F32, 0: F32, 1: F32, 2: F32, 3: F32, "post": F32}

    run("A all f32 / highest", lambda p: mel_l1_of(dec_mixed(p["dec"], z_f32(p), cfg, all_f32)))

    # f32 storage, DEFAULT matmuls (what 'f32 without highest' buys)
    def b_fn(p):
        with jax.default_matmul_precision("default"):
            return mel_l1_of(dec_mixed(p["dec"], z_f32(p), cfg, all_f32))
    log_b = float(jax.jit(b_fn)(params))
    log(f"{'B all f32 / default matmul':44s} mel_l1 = {log_b:.5f}")

    run("C prior bf16, dec f32/highest",
        lambda p: mel_l1_of(dec_mixed(p["dec"], z_bf16(p).astype(F32), cfg, all_f32)))

    bf16_all = {"pre": BF16, 0: BF16, 1: BF16, 2: BF16, 3: BF16, "post": BF16}
    run("D prior f32/highest, dec bf16 XLA",
        lambda p: mel_l1_of(dec_mixed(p["dec"], z_f32(p), cfg, bf16_all).astype(F32)))

    # Pallas variants: the 'highest' context must NOT wrap pallas_call (its
    # fp32 contract_precision is rejected for bf16 operands by Mosaic), so
    # scope it to the f32 prior / metric pieces only.
    def e_fn(p):
        with jax.default_matmul_precision("highest"):
            z = z_f32(p)
        wav = decoder_apply(p["dec"], z.astype(BF16), cfg, use_pallas=True,
                            dtype=BF16).astype(F32)
        with jax.default_matmul_precision("highest"):
            return mel_l1_of(wav)
    v = float(jax.jit(e_fn)(params))
    log(f"{'E prior f32/highest, dec bf16 Pallas':44s} mel_l1 = {v:.5f}")

    def f_fn(p):
        z = z_bf16(p)
        wav = decoder_apply(p["dec"], z, cfg, use_pallas=True,
                            dtype=BF16).astype(F32)
        with jax.default_matmul_precision("highest"):
            return mel_l1_of(wav)
    v = float(jax.jit(f_fn)(params))
    log(f"{'F prior bf16, dec bf16 Pallas (= serving)':44s} mel_l1 = {v:.5f}")

    # Per-piece injection: everything f32/highest EXCEPT one piece in bf16
    for piece in ["pre", 0, 1, 2, 3, "post"]:
        dts = dict(all_f32)
        dts[piece] = BF16
        run(f"G only piece {piece!r} bf16",
            lambda p, dts=dts: mel_l1_of(dec_mixed(p["dec"], z_f32(p), cfg, dts).astype(F32)))

    # Cumulative: pieces >= s in bf16 (tail-bf16 configs are the cheap ones:
    # late stages carry most of the FLOPs)
    order = ["pre", 0, 1, 2, 3, "post"]
    for s in range(1, len(order)):
        dts = {k: (F32 if k in order[:s] else BF16) for k in order}
        run(f"H f32 through {order[s-1]!r}, bf16 after",
            lambda p, dts=dts: mel_l1_of(dec_mixed(p["dec"], z_f32(p), cfg, dts).astype(F32)))


if __name__ == "__main__":
    main()
