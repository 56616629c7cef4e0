"""Fast functional decoder over a folded parameter pytree.

Serving-path alternative to the flax Generator module: operates directly on
``fold_weight_norm``-ed params (plain torch-layout arrays), so each MRF stage
can be routed to either the XLA conv path or the fused Pallas kernel
(kernels/mrf.py) without touching the training module graph. Bit-compatible
with ``Generator.__call__`` (parity-tested).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from smart_vocoder_tpu.kernels.mrf import (
    fused_mrf_stage,
    fused_mrf_stage_packed,
    fused_up_mrf_stage,
    mrf_stage_reference,
)

LRELU_SLOPE = 0.1


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)

    @classmethod
    def from_hparams(cls, hps) -> "DecoderConfig":
        return cls(
            resblock=hps.model.resblock,
            resblock_kernel_sizes=tuple(hps.model.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(tuple(d) for d in hps.model.resblock_dilation_sizes),
            upsample_rates=tuple(hps.model.upsample_rates),
            upsample_initial_channel=hps.model.upsample_initial_channel,
            upsample_kernel_sizes=tuple(hps.model.upsample_kernel_sizes),
        )


def _conv1d(x, w_oik, bias, padding, dtype, out_f32=False):
    """``out_f32``: bf16 MXU operands but f32 accumulate/storage -- the
    "f32 activations, single-bf16 matmul" recipe of kernels/mrf.py
    f32_storage, applied to the XLA lowering (hifi level-3 early path)."""
    w = jnp.transpose(w_oik, (2, 1, 0)).astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w, (1,), [(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32 if out_f32 else None,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _conv_transpose_polyphase(x, w_iok, bias, k, s, p, dtype, out_f32=False):
    """Identical math to NormConvTranspose1d's polyphase path (nn/conv.py)."""
    import numpy as np

    in_ch = x.shape[-1]
    out_ch = w_iok.shape[1]
    d_min = -((s - 1 + p) // s)
    d_max = (k - 1 - p) // s
    kp = d_max - d_min + 1
    t_idx = s * (d_min + np.arange(kp))[:, None] + np.arange(s)[None, :] + p
    valid = (t_idx >= 0) & (t_idx < k)
    gathered = w_iok[:, :, np.clip(t_idx, 0, k - 1)]
    gathered = jnp.where(jnp.asarray(valid), gathered, 0.0)
    wc = jnp.transpose(gathered, (2, 0, 3, 1))[::-1]
    wc = wc.reshape(kp, in_ch, s * out_ch).astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), wc, (1,), [(kp - 1 + d_min, -d_min)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32 if out_f32 else None,
    )
    bsz, t, _ = y.shape
    y = y.reshape(bsz, t * s, out_ch)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _conv_transpose_packed(x, w_iok, bias, k, s, p, pack, dtype):
    """Transposed conv evaluated in the space-to-depth packed domain.

    The unpacked lowering at the late stages (cout 32/64) is lane-starved on
    both operands AND streams its big tensors at sub-128-lane alignment --
    measured 33 ms for ups_3 at the bench shape vs ~0.07 TFLOP of useful
    work. Packing (nn/conv.py pack_convtranspose_weight) makes it one dense
    128-lane conv: input viewed (B, T/(pack/s), (pack/s)*Cin), output
    (B, T*s/pack, pack*Cout) -- which is bitwise the packed layout the fused
    MRF kernel consumes, so XLA elides the reshapes on both sides.
    """
    from smart_vocoder_tpu.nn.conv import pack_convtranspose_weight

    bsz, t, cin = x.shape
    cout = w_iok.shape[1]
    wp, lo, hi = pack_convtranspose_weight(w_iok, s, p, pack)
    ps = pack // s
    xr = x.reshape(bsz, t // ps, ps * cin)
    y = jax.lax.conv_general_dilated(
        xr.astype(dtype), wp.astype(dtype), (1,), [(lo, hi)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if bias is not None:
        # bias add in the packed domain: broadcasting over the unpacked
        # (.., Cout) view between two reshapes forces a materialization in
        # the lane-starved layout and costs ~20 ms at the bench shape
        y = y + jnp.tile(bias, pack).astype(dtype)
    return y.reshape(bsz, t * s, cout)


def _stage_branches(params, stage: int, num_kernels: int, n_pairs: int, dtype):
    """Assemble (w1, b1, w2, b2) HIO branch weights from folded resblock params."""
    branches = []
    for j in range(num_kernels):
        rb = params[f"resblocks_{stage * num_kernels + j}"]
        w1 = jnp.stack([jnp.transpose(rb[f"convs1_{i}"]["weight"], (2, 1, 0))
                        for i in range(n_pairs)]).astype(dtype)
        b1 = jnp.stack([rb[f"convs1_{i}"]["bias"] for i in range(n_pairs)]).astype(dtype)
        w2 = jnp.stack([jnp.transpose(rb[f"convs2_{i}"]["weight"], (2, 1, 0))
                        for i in range(n_pairs)]).astype(dtype)
        b2 = jnp.stack([rb[f"convs2_{i}"]["bias"] for i in range(n_pairs)]).astype(dtype)
        branches.append((w1, b1, w2, b2))
    return branches


def decoder_apply(
    params_dec,
    x: jnp.ndarray,
    cfg: DecoderConfig,
    g: jnp.ndarray | None = None,
    use_pallas: bool = False,
    interpret: bool = False,
    dtype=jnp.bfloat16,
    max_stages: int | None = None,
    pallas_stage2: bool = False,
    hifi_tail: bool | int = False,
) -> jnp.ndarray:
    """Folded dec params + latent (B, T, C) -> waveform (B, T*hop, 1).

    ``max_stages`` truncates the pipeline after N upsample+MRF stages
    (skipping conv_post) -- profiling aid for per-stage prefix timing.

    ``hifi_tail`` runs the final (waveform-adjacent) fused stage + conv_post
    tail at serving-fidelity precision (f32 activations, 2-pass bf16 matmuls,
    f32 waveform out; kernels/mrf.py hifi mode) -- the minimal f32 island
    that brings the bf16 serving path's mel-L1 under the 1e-2 target.
    Accepts an int LEVEL, ordered by measured mel-L1 improvement per ms
    (scripts/fidelity_frontier.py): 0/False off; 1/True the tail island
    (stage-4 x2 + stage-3 f32 storage); 2 additionally keeps the EARLY
    decoder (conv_pre, the XLA polyphase upsamples, the ch>=128 XLA MRF
    stages) in f32 activations with single-bf16 MXU operands -- the
    f32_storage recipe applied to the XLA lowerings, Pallas stage I/O stays
    bf16 (the serving headline, paired with an f32 prior by the callers);
    3 also splits stage-3's matmuls two-pass hi/lo (measured dominated:
    +37 ms for 4e-5 mel-L1 -- kept only as a frontier point)."""
    assert cfg.resblock == "1", "fast decoder supports ResBlock1 configs"
    num_kernels = len(cfg.resblock_kernel_sizes)
    ks = tuple(cfg.resblock_kernel_sizes)
    dil = tuple(cfg.resblock_dilation_sizes[0])
    # One dilation tuple shared across branches (true of the reference config
    # family); a per-branch mix would silently produce wrong audio here.
    assert all(tuple(d) == dil for d in cfg.resblock_dilation_sizes), (
        "fast decoder assumes identical dilation tuples across MRF branches; "
        f"got {cfg.resblock_dilation_sizes} -- use the flax Generator path"
    )

    early_f32 = int(hifi_tail) >= 2
    x = _conv1d(x, params_dec["conv_pre"]["weight"], params_dec["conv_pre"]["bias"], 3, dtype,
                out_f32=early_f32)
    if g is not None:
        x = x + _conv1d(g, params_dec["cond"]["weight"], params_dec["cond"]["bias"], 0, dtype,
                        out_f32=early_f32)

    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        if max_stages is not None and i >= max_stages:
            return x
        ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        ups = params_dec[f"ups_{i}"]
        branches = _stage_branches(params_dec, i, num_kernels, len(dil), dtype)

        # Kernel routing, measured end-to-end on v5e (bench.py, tunnel-safe
        # readback-synced timing). ch<=64 stages: the whole
        # lrelu -> ConvTranspose upsample -> MRF block runs as ONE Pallas
        # kernel (fused_up_mrf_stage) -- isolated stage4 A/B: 53.9 ms vs
        # 71.5 ms for the separate leaky+polyphase-ups+packed-MRF chain. The
        # unpacked ups lowering is lane-starved (~33 ms for ~0.07 TFLOP at
        # ups_3), and evaluating it as a standalone packed XLA conv instead
        # triggered an XLA layout flip-flop around stage2's convs (43 copies
        # of the 524 MB (32,64000,128) tensor, ~20 ms) -- in-kernel is both
        # fastest and fusion-inert. ch=128 (stage2) stays on XLA convs: at
        # full lane width XLA runs them at ~87% of roofline, and every packed
        # formulation inflates MACs by the Toeplitz factor.
        # fused_up only where the input is itself a Pallas stage (ch<=32 ==
        # stage4, fed by stage3's kernel): hanging a Pallas consumer directly
        # off stage2's XLA convs re-triggers the layout flip-flop (39 copies).
        # Both packed lane widths must hit the 128-lane DMA tiling (small
        # test configs can otherwise route e.g. ps*cin=32, which Mosaic
        # rejects: "Slice shape ... must be aligned to tiling (128)").
        pack = max(1, 128 // ch)
        lanes_ok = (pack % u == 0
                    and (pack // u) * x.shape[-1] % 128 == 0
                    and pack * ch % 128 == 0)
        # Experimental stages-2..4-contiguous-Pallas routing (pallas_stage2):
        # the ch=128 stage runs the UNPACKED fused MRF kernel (pack=1 => no
        # Toeplitz inflation) after its XLA upsample, and the ch=64 stage can
        # then fold ITS upsample into the packed kernel (fused_up) because its
        # input is a Pallas producer (no XLA layout flip-flop risk).
        fold_up = ch <= 32 or (pallas_stage2 and ch <= 64)
        if (use_pallas and fold_up and lanes_ok
                and x.shape[1] % (pack // u) == 0):
            # Final stage: fold the decoder tail (lrelu -> conv_post -> tanh)
            # into the kernel too -- standalone it costs 16 ms (lane-starved)
            # and any XLA-conv replacement re-triggers the layout flip-flop.
            fold_post = (i == len(cfg.upsample_rates) - 1
                         and max_stages is None)
            x = fused_up_mrf_stage(
                x, ups["weight"], ups["bias"], k, u, (k - u) // 2,
                branches, ks, dil, tile=2048, interpret=interpret,
                post_weight=(params_dec["conv_post"]["weight"]
                             if fold_post else None),
                hifi=int(hifi_tail) >= 1 and fold_post,
            )
            if fold_post:
                return x  # (B, T*hop, 1) waveform, tanh applied in-kernel
        else:
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            x = _conv_transpose_polyphase(x, ups["weight"], ups["bias"], k, u,
                                          (k - u) // 2, dtype,
                                          out_f32=early_f32)
            if (use_pallas and ch <= 64 and pack * ch % 128 == 0
                    and x.shape[1] % pack == 0):
                # hifi_tail also upgrades this (second-to-last) stage to f32
                # storage: its bf16 output rounding was the largest remaining
                # term (0.0045) after the final-stage fix
                x = fused_mrf_stage_packed(x.astype(dtype), branches, ks, dil,
                                           interpret=interpret,
                                           f32_storage=int(hifi_tail) >= 1,
                                           x2=int(hifi_tail) >= 3)
            elif (use_pallas and pallas_stage2 and ch % 128 == 0
                    and x.shape[1] % 512 == 0):
                x = fused_mrf_stage(x.astype(dtype), branches, ks, dil,
                                    tile=1024, interpret=interpret)
            else:
                x = mrf_stage_reference(x, branches, ks, dil,
                                        mixed_f32=early_f32)

    if max_stages is not None:
        # prefix profiling: max_stages == n_stages still stops BEFORE
        # conv_post, so the conv_post row of the profile is a real delta
        return x
    x = jax.nn.leaky_relu(x)  # default 0.01 slope (models.py:156)
    # conv_post stays on the direct lowering: the honest prefix profile puts
    # it at 16.2 ms (lane-starved, ~0.004 TFLOP), but a packed-domain XLA
    # conv here measured 1569x vs 1691x end-to-end same-session -- one more
    # XLA conv consuming a Pallas output re-triggers the global layout
    # flip-flop (see the stage-routing comment above). The only layout-inert
    # fix would be folding conv_post into the stage4 kernel's tail.
    x = _conv1d(x, params_dec["conv_post"]["weight"], None, 3, dtype)
    return jnp.tanh(x)
