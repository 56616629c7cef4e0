"""Fast functional prior encoder + reverse flow over folded params.

Serving-path alternative to the flax ``MelEncoder`` / ``ResidualCouplingBlock``
graph: the 1x1 projections are plain matmuls and every unconditioned WN stack
(16 enc_p layers + 4x8 flow layers -- the non-decoder hot path, reference
modules.py:111-184) runs through the fused Pallas kernel
(kernels/wn_stack.py), which keeps the gate and res/skip accumulation
in-register across ``layers_per_call`` layers per HBM round trip.

Bit-compatible with ``SynthesizerTrn.infer``'s prior/flow stages
(parity-tested in tests/test_fast_encoder.py). Unconditioned (g=None) only,
which covers the inference path of both shipped configs (the reference forces
g=None everywhere, models.py:318/:332); speaker-conditioned runs fall back to
the module graph in ``Vocoder``.
"""

from __future__ import annotations

import jax.numpy as jnp

from smart_vocoder_tpu.kernels.wn_stack import fused_wn_stack, wn_layers_from_params


def _matmul_1x1(x, w_oik, bias, dtype):
    """Folded torch-layout (O, I, 1) conv == one matmul on (B, T, I)."""
    w = jnp.transpose(w_oik[:, :, 0]).astype(dtype)  # (I, O)
    y = jnp.dot(x.astype(dtype), w)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def enc_p_apply(
    params_enc_p,
    mel: jnp.ndarray,     # (B, T, n_mels)
    x_mask: jnp.ndarray,  # (B, T, 1)
    n_layers: int = 16,
    hidden: int = 192,
    use_pallas: bool = True,
    interpret: bool = False,
    dtype=jnp.bfloat16,
    wn_kwargs: dict | None = None,
):
    """Mel prior network over folded params: (m_p, logs_p).

    Mirrors MelEncoder.__call__ (models/synthesizer.py:59-70; reference
    models.py:15-47): pre 1x1 -> WN(g=None) -> proj 1x1, mask applied
    at the WN input and the stats output.
    """
    mask = x_mask.astype(dtype)
    x = _matmul_1x1(mel, params_enc_p["pre_enc"]["weight"],
                    params_enc_p["pre_enc"]["bias"], dtype)
    x = x * mask
    layers = wn_layers_from_params(params_enc_p["encoder"], n_layers)
    if use_pallas:
        x = fused_wn_stack(x, x_mask, layers, hidden, interpret=interpret,
                           **(wn_kwargs or {}))
    else:
        x = _wn_stack_xla(x, mask, layers, hidden, dtype)
    stats = _matmul_1x1(x, params_enc_p["proj"]["weight"],
                        params_enc_p["proj"]["bias"], dtype) * mask
    out = stats.shape[-1] // 2
    return stats[..., :out], stats[..., out:]


def flow_reverse_apply(
    params_flow,
    x: jnp.ndarray,       # (B, T, inter) latent z_p
    x_mask: jnp.ndarray,  # (B, T, 1)
    n_flows: int = 4,
    n_layers: int = 8,
    hidden: int = 192,
    use_pallas: bool = True,
    interpret: bool = False,
    dtype=jnp.bfloat16,
    wn_kwargs: dict | None = None,
):
    """Reverse residual-coupling flow z_p -> z over folded params.

    Mirrors ResidualCouplingBlock(reverse=True) (models/synthesizer.py:147-151;
    reference models.py:73-80): per step flip then mean-only coupling
    ``x1 = (x1 - m(x0)) * mask`` with the WN core fused.
    """
    mask = x_mask.astype(dtype)
    x = x.astype(dtype)
    for i in reversed(range(n_flows)):
        x = x[..., ::-1]  # Flip (modules.py:270-277), its own inverse
        p = params_flow[f"flows_{2 * i}"]
        half = x.shape[-1] // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = _matmul_1x1(x0, p["pre"]["weight"], p["pre"]["bias"], dtype) * mask
        layers = wn_layers_from_params(p["enc"], n_layers)
        if use_pallas:
            h = fused_wn_stack(h, x_mask, layers, hidden, interpret=interpret,
                               **(wn_kwargs or {}))
        else:
            h = _wn_stack_xla(h, mask, layers, hidden, dtype)
        m = _matmul_1x1(h, p["post"]["weight"], p["post"]["bias"], dtype) * mask
        x1 = (x1 - m) * mask
        x = jnp.concatenate([x0, x1], axis=-1)
    return x


def prior_flow_apply(
    params,               # folded SynthesizerTrn params (enc_p/flow/dec/...)
    mel: jnp.ndarray,
    x_mask: jnp.ndarray,
    eps: jnp.ndarray,     # (B, T, inter) prior noise
    noise_scale: float,
    enc_layers: int = 16,
    n_flows: int = 4,
    flow_wn_layers: int = 8,
    hidden: int = 192,
    use_pallas: bool = True,
    interpret: bool = False,
    dtype=jnp.bfloat16,
):
    """mel -> masked latent z, SynthesizerTrn.infer up to the decoder
    (models/synthesizer.py:315-322)."""
    m_p, logs_p = enc_p_apply(params["enc_p"], mel, x_mask, enc_layers, hidden,
                              use_pallas=use_pallas, interpret=interpret, dtype=dtype)
    z_p = m_p + eps.astype(m_p.dtype) * jnp.exp(logs_p) * noise_scale
    z = flow_reverse_apply(params["flow"], z_p, x_mask, n_flows, flow_wn_layers,
                           hidden, use_pallas=use_pallas, interpret=interpret,
                           dtype=dtype)
    return z * x_mask.astype(z.dtype)


def _wn_stack_xla(x, mask, layers, hidden, dtype):
    """XLA fallback with identical layer algebra (for A/B and odd shapes)."""
    import jax

    output = jnp.zeros_like(x)
    n = len(layers)
    for i, (w_in, b_in, w_rs, b_rs) in enumerate(layers):
        w = jnp.transpose(w_in, (2, 1, 0)).astype(dtype)  # (k, H, 2H)
        pad = (w.shape[0] - 1) // 2
        a = jax.lax.conv_general_dilated(
            x.astype(dtype), w, (1,), [(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + b_in.astype(dtype)
        acts = jnp.tanh(a[..., :hidden]) * jax.nn.sigmoid(a[..., hidden:])
        rs = _matmul_1x1(acts, w_rs, b_rs, dtype)
        if i < n - 1:
            x = (x + rs[..., :hidden]) * mask
            output = output + rs[..., hidden:]
        else:
            output = output + rs
    return output * mask
