"""Fused WN (WaveNet-gate) stack kernel.

The WN stack is THE hot block of the encoders and the flow (64 layers per
generator step, SURVEY.md section 2.1): per layer a k=5 dilation-1 conv
H -> 2H, the add-tanh-sigmoid gate, and a 1x1 res/skip conv
(modules.py:148-176). This kernel runs ``layers_per_call`` layers per time
tile entirely in VMEM -- the BASELINE north-star item "WN stacks fused into
Pallas dilated-conv1d kernels with the gating done in-register".

Layout: hidden H=192 is not lane-aligned, so rows are packed by 2
(``(T/2, 2H=384 = 3x128)``). All conv weights are pre-packed block-Toeplitz
(nn/conv.py pack_conv_weight) with their *output columns permuted* so the
gate and res/skip splits land on 128-aligned lane boundaries:

  in_layer out:   natural [tanh_s0|sig_s0|tanh_s1|sig_s1] -> [tanh_s0|tanh_s1|sig_s0|sig_s1]
  res_skip out:   natural [res_s0|skip_s0|res_s1|skip_s1] -> [res_s0|res_s1|skip_s0|skip_s1]

so in-kernel slicing is ``a[:, :2H]`` / ``a[:, 2H:]`` only.

Unconditioned (g=None) stacks only -- which covers the inference path of both
shipped configs (the reference forces g=None everywhere, models.py:318/:332);
conditioned stacks fall back to the module graph.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smart_vocoder_tpu.nn.conv import pack_conv_weight

PACK = 2  # row packing: 192 hidden channels * 2 = 384 lanes


def _leaky_free_sigmoid(x):
    return jax.nn.sigmoid(x)


def _interleave_perm(h: int, p: int = PACK) -> np.ndarray:
    """Permutation mapping natural packed columns [A_s0|B_s0|A_s1|B_s1]
    (block h each) to [A_s0|A_s1|B_s0|B_s1]."""
    idx = []
    for half in range(2):
        for j in range(p):
            base = j * 2 * h + half * h
            idx.extend(range(base, base + h))
    return np.asarray(idx)


def pack_wn_layer(w_in_oik, b_in, w_rs_oik, b_rs, hidden: int):
    """Pre-pack one WN layer's weights for the kernel.

    w_in (2H, H, k) torch layout; w_rs (2H or H, H, 1). Returns
    (wp_in, bp_in, lo, hi, wp_rs, bp_rs, has_res).
    """
    k = w_in_oik.shape[-1]
    has_res = w_rs_oik.shape[0] == 2 * hidden

    w_in_hio = jnp.transpose(w_in_oik, (2, 1, 0))  # (k, H, 2H)
    wp_in, lo, hi = pack_conv_weight(w_in_hio, 1, PACK)  # (kp, 2H, 2*2H)
    perm = _interleave_perm(hidden)
    wp_in = wp_in[:, :, perm]
    bp_in = jnp.tile(b_in, PACK)[perm]

    w_rs_hio = jnp.transpose(w_rs_oik, (2, 1, 0))  # (1, H, rs)
    wp_rs, lo_rs, hi_rs = pack_conv_weight(w_rs_hio, 1, PACK)
    assert lo_rs == 0 and hi_rs == 0
    bp_rs = jnp.tile(b_rs, PACK)
    if has_res:
        perm_rs = _interleave_perm(hidden)
        wp_rs = wp_rs[:, :, perm_rs]
        bp_rs = bp_rs[perm_rs]
    return wp_in, bp_in, lo, hi, wp_rs, bp_rs, has_res


def _conv_rows(x, wp, bias, lo, hi):
    length = x.shape[0]
    xp = jnp.pad(x, ((lo, hi), (0, 0)))
    acc = jnp.zeros((length, wp.shape[2]), jnp.float32)
    for i in range(wp.shape[0]):
        acc = acc + jnp.dot(xp[i : i + length, :], wp[i],
                            preferred_element_type=jnp.float32)
    return acc + bias.astype(jnp.float32)


def _wn_kernel(metas, hidden, tile, radius, x_hbm, mask_hbm, *refs):
    """metas: per layer (lo, hi, has_res). refs: 4 weight refs per layer,
    then x_out, skip_out, scratch x/mask, sems."""
    n_l = len(metas)
    w_refs = refs[: 4 * n_l]
    x_out = refs[4 * n_l]
    skip_out = refs[4 * n_l + 1]
    x_vmem = refs[4 * n_l + 2]
    m_vmem = refs[4 * n_l + 3]
    sems = refs[4 * n_l + 4]

    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile, tile + 2 * radius), :], x_vmem, sems.at[0])
    cm = pltpu.make_async_copy(
        mask_hbm.at[b, pl.ds(i * tile, tile + 2 * radius), :], m_vmem, sems.at[1])
    cp.start()
    cm.start()
    cp.wait()
    cm.wait()

    x = x_vmem[...]
    mask = m_vmem[...]
    ph = PACK * hidden  # 384
    skip = jnp.zeros(x.shape, jnp.float32)
    for li, (lo, hi, has_res) in enumerate(metas):
        w_in, b_in, w_rs, b_rs = (w_refs[4 * li + j][...] for j in range(4))
        a = _conv_rows(x, w_in, b_in, lo, hi)  # (L, 2*ph) cols [tanh|sig]
        acts = (jnp.tanh(a[:, :ph]) * jax.nn.sigmoid(a[:, ph:])).astype(x.dtype)
        rs = _conv_rows(acts, w_rs, b_rs, 0, 0)  # (L, 2*ph) [res|skip] or (L, ph) skip
        if has_res:
            x = (x + rs[:, :ph].astype(x.dtype)) * mask
            skip = skip + rs[:, ph:]
        else:
            skip = skip + rs
    x_out[0] = x[radius : radius + tile]
    skip_out[0] = skip.astype(x.dtype)[radius : radius + tile]


def fused_wn_stack(
    x: jnp.ndarray,       # (B, T, H) masked input
    x_mask: jnp.ndarray,  # (B, T, 1)
    layers: List[tuple],  # per layer (w_in (2H,H,k), b_in, w_rs, b_rs) torch layout
    hidden: int,
    layers_per_call: int = 4,
    tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full WN stack output (sum of skips * mask), matching nn.WN with g=None."""
    bsz, t, h = x.shape
    assert h == hidden and t % PACK == 0, (x.shape, hidden)
    tp = t // PACK
    ph = PACK * hidden

    packed_layers = [pack_wn_layer(*lay, hidden=hidden) for lay in layers]

    # per-sample mask repeated across each sample's hidden block
    mask_rows = jnp.repeat(x_mask.reshape(bsz, tp, PACK), hidden, axis=-1)

    xr = x.reshape(bsz, tp, ph)
    skip_total = jnp.zeros_like(xr)

    for start in range(0, len(layers), layers_per_call):
        chunk = packed_layers[start : start + layers_per_call]
        radius = -(-sum(max(l[2], l[3]) for l in chunk) // 8) * 8
        t_pad = -tp % tile
        xp = jnp.pad(xr, ((0, 0), (radius, radius + t_pad), (0, 0)))
        mp = jnp.pad(mask_rows.astype(x.dtype),
                     ((0, 0), (radius, radius + t_pad), (0, 0)))
        n_tiles = (tp + t_pad) // tile

        metas = tuple((l[2], l[3], l[6]) for l in chunk)
        weight_args = []
        for wp_in, bp_in, _, _, wp_rs, bp_rs, _ in chunk:
            weight_args += [wp_in.astype(x.dtype), bp_in.astype(x.dtype),
                            wp_rs.astype(x.dtype), bp_rs.astype(x.dtype)]

        kernel = functools.partial(_wn_kernel, metas, hidden, tile, radius)
        in_specs = [pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY)]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weight_args)
        x_new, skip = pl.pallas_call(
            kernel,
            grid=(bsz, n_tiles),
            out_shape=(
                jax.ShapeDtypeStruct((bsz, tp + t_pad, ph), x.dtype),
                jax.ShapeDtypeStruct((bsz, tp + t_pad, ph), x.dtype),
            ),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, tile, ph), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, ph), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((tile + 2 * radius, ph), x.dtype),
                pltpu.VMEM((tile + 2 * radius, ph), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(xp, mp, *weight_args)
        xr = x_new[:, :tp]
        skip_total = skip_total + skip[:, :tp]

    out = skip_total.reshape(bsz, t, hidden) * x_mask.astype(x.dtype)
    return out


def wn_layers_from_params(params_wn, n_layers: int) -> List[tuple]:
    """Extract per-layer (w_in, b_in, w_rs, b_rs) from folded WN params."""
    layers = []
    for i in range(n_layers):
        il = params_wn[f"in_layers_{i}"]
        rs = params_wn[f"res_skip_layers_{i}"]
        layers.append((il["weight"], il["bias"], rs["weight"], rs["bias"]))
    return layers
