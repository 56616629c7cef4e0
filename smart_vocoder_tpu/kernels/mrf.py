"""Fused multi-receptive-field (MRF) stage kernel.

One HiFi-GAN MRF stage = mean over 3 parallel ResBlock1 branches; branch with
kernel size k runs 3 residual pairs ``x += c2(lrelu(c1_dj(lrelu(x))))`` with
dilations dj in (1, 3, 5) (reference modules.py:187-229, models.py:149-155).
Under XLA each of the 18 convs round-trips activations through HBM; at the
decoder's late stages (time up to 256k samples, channels 32..128) that is
~20 full-tensor traversals per stage and the convs are MXU-lane-starved.

This kernel processes the whole stage per time tile in VMEM:
  - grid (batch, T/TILE); the input tile is DMA'd with a halo of R =
    max_k (k-1)/2 * sum(dj + 1) columns (the stage's receptive radius), so
    every intermediate conv has true neighbor data and the central TILE
    columns of the final result are exact.
  - each conv is a static tap loop of (L, Cin) @ (Cin, Cout) MXU dots
    accumulated in float32; activations never leave VMEM.
  - tile-edge reads beyond the halo see zeros, matching torch's zero padding
    at true sequence boundaries (the wrapper pre-pads by R).

Weights arrive as plain (k, Cin, Cout) arrays (fold weight norm first);
`mrf_stage_reference` is the jnp mirror used for parity tests and as the
non-TPU fallback.
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1

# Branch structure of ResBlock1 as instantiated by the generator
# (models.py:130-133): kernel sizes per branch, dilations per pair.
DILATIONS = (1, 3, 5)

BranchWeights = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]
# (w1 (3, k, C, C), b1 (3, C), w2 (3, k, C, C), b2 (3, C))


def stage_radius(kernel_sizes: Sequence[int], dilations: Sequence[int] = DILATIONS) -> int:
    """Receptive radius of one branch chain, maxed over branches."""
    return max(
        (k - 1) // 2 * sum(d + 1 for d in dilations) for k in kernel_sizes
    )


def _leaky(x):
    # For slope < 1, leaky-relu IS a two-op max: max(x, slope*x)
    # (x>0: x > slope*x; x<0: slope*x > x). Saves 2 VPU passes per call vs
    # the max/min+mul+add form; measured -1.5 ms on the stage3 kernel.
    return jnp.maximum(x, x * LRELU_SLOPE)


def _conv_taps(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, dilation: int) -> jnp.ndarray:
    """Same-length dilated conv on (L, C) via static tap loop of MXU dots."""
    k = w.shape[0]
    r = (k - 1) // 2 * dilation
    length = x.shape[0]
    xp = jnp.pad(x, ((r, r), (0, 0)))
    acc = jnp.zeros((length, w.shape[2]), jnp.float32)
    for t in range(k):
        acc = acc + jnp.dot(
            xp[t * dilation : t * dilation + length, :], w[t],
            preferred_element_type=jnp.float32,
        )
    return (acc + b.astype(jnp.float32)).astype(x.dtype)


def _branch_chain(x: jnp.ndarray, w1, b1, w2, b2, dilations, valid) -> jnp.ndarray:
    """One ResBlock1 branch: 3 residual (c1_dj, c2) pairs (modules.py:210-222).

    ``valid`` masks rows outside the real sequence: torch zero-pads every
    *intermediate* at the true boundary, so each conv output must be zeroed
    there before feeding the next conv / residual.
    """
    for j, d in enumerate(dilations):
        xt = _conv_taps(_leaky(x), w1[j], b1[j], d) * valid
        xt = _conv_taps(_leaky(xt), w2[j], b2[j], 1) * valid
        x = xt + x
    return x


def _mrf_kernel(
    kernel_sizes, dilations, tile, radius, t_real,
    x_hbm, *refs,
):
    # refs: 4 weight refs per branch, then out_ref, then scratch x_vmem + sem.
    n_br = len(kernel_sizes)
    w_refs = refs[: 4 * n_br]
    out_ref = refs[4 * n_br]
    x_vmem = refs[4 * n_br + 1]
    sem = refs[4 * n_br + 2]

    b = pl.program_id(0)
    i = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile, tile + 2 * radius), :], x_vmem, sem
    )
    cp.start()
    cp.wait()

    x = x_vmem[...]
    # Global row of local row l is i*tile + l in the padded array; real data
    # occupies padded rows [radius, radius + t_real). Float compares sidestep
    # sub-lane int32 compare limits on some targets; the iota itself must be
    # integer (f32 iota is rejected by current Mosaic) and is cast after.
    rows = (jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
            .astype(jnp.float32) + jnp.float32(i * tile))
    valid = jnp.where(
        (rows >= jnp.float32(radius)) & (rows < jnp.float32(radius + t_real)),
        jnp.ones_like(rows), jnp.zeros_like(rows),
    ).astype(x.dtype)

    acc = jnp.zeros(x.shape, jnp.float32)
    for br in range(n_br):
        w1, b1, w2, b2 = (w_refs[4 * br + j][...] for j in range(4))
        acc = acc + _branch_chain(x, w1, b1, w2, b2, dilations, valid).astype(jnp.float32)
    result = (acc / n_br).astype(x.dtype)
    out_ref[0] = result[radius : radius + tile]


def fused_mrf_stage(
    x: jnp.ndarray,
    branches: List[BranchWeights],
    kernel_sizes: Sequence[int],
    dilations: Sequence[int] = DILATIONS,
    tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply one fused MRF stage to ``x (B, T, C)``."""
    bsz, t, c = x.shape
    radius = stage_radius(kernel_sizes, dilations)
    # Pad so the radius halo exists on both ends and T divides the tile.
    t_pad = -t % tile
    xp = jnp.pad(x, ((0, 0), (radius, radius + t_pad), (0, 0)))
    n_tiles = (t + t_pad) // tile

    weight_args = []
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]  # x stays in HBM, DMA'd manually
    for w1, b1, w2, b2 in branches:
        for arr in (w1, b1, w2, b2):
            weight_args.append(arr.astype(x.dtype))
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _mrf_kernel, tuple(kernel_sizes), tuple(dilations), tile, radius, t
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        out_shape=jax.ShapeDtypeStruct((bsz, t + t_pad, c), x.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, c), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * radius, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, *weight_args)
    return out[:, :t]


def _packed_conv_vmem(x: jnp.ndarray, wp: jnp.ndarray, bias: jnp.ndarray,
                      lo: int, hi: int, out_dtype=None) -> jnp.ndarray:
    """Packed-domain conv on a VMEM value: y[q] = sum_i xpad[q+i] @ wp[i]."""
    length = x.shape[0]
    xp = jnp.pad(x, ((lo, hi), (0, 0)))
    acc = jnp.zeros((length, wp.shape[2]), jnp.float32)
    for i in range(wp.shape[0]):
        acc = acc + jnp.dot(xp[i : i + length, :], wp[i],
                            preferred_element_type=jnp.float32)
    return (acc + bias.astype(jnp.float32)).astype(out_dtype or x.dtype)


def _packed_conv_vmem_x2(x: jnp.ndarray, wp: jnp.ndarray, bias: jnp.ndarray,
                         lo: int, hi: int) -> jnp.ndarray:
    """Two-pass (hi/lo input split) packed conv: f32-in, f32-out with bf16
    MXU operands. Input-rounding error drops from 2^-8 to ~2^-16 relative;
    the weights stay a single bf16 (weight rounding measured negligible:
    scripts/bisect_fidelity2.py R2 = 0.0012 mel-L1). 2x the MXU passes.

    The split is by mantissa TRUNCATION (bitmask), not round-to-nearest:
    hi = upper-16-bits(x) is exactly bf16-representable and x == hi + lo
    exactly, so the pair is just as accurate while costing 2 VPU ops
    (AND, SUB) instead of 4 (round, upcast, sub, round)."""
    length = x.shape[0]
    x = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32)
    x_hi = hi32.astype(jnp.bfloat16)          # exact: hi32 has a bf16 mantissa
    x_lo = (x - hi32).astype(jnp.bfloat16)    # |lo| < 2^-8 |x|; fits one bf16
    hp = jnp.pad(x_hi, ((lo, hi), (0, 0)))
    lp = jnp.pad(x_lo, ((lo, hi), (0, 0)))
    acc = jnp.zeros((length, wp.shape[2]), jnp.float32)
    for i in range(wp.shape[0]):
        acc = acc + jnp.dot(hp[i : i + length, :], wp[i],
                            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(lp[i : i + length, :], wp[i],
                            preferred_element_type=jnp.float32)
    return acc + bias.astype(jnp.float32)


def _pertap_operands(x: jnp.ndarray, lo: int, hi: int, shifts):
    """Yield the per-tap (L, p*C) operands for a per-tap packed conv
    (nn/conv.py pack_conv_weight_pertap): each is a plain row-shifted read,
    or one lane-prefix select of two row-shifted reads when the tap's
    phase offsets straddle a packed-row boundary."""
    length = x.shape[0]
    xp = jnp.pad(x, ((lo, hi), (0, 0)))
    p = len(shifts[0])
    gs = x.shape[1] // p
    lane = jax.lax.broadcasted_iota(jnp.int32, (length, x.shape[1]), 1)
    for sig in shifts:
        if sig[0] == sig[-1]:
            yield xp[sig[0] : sig[0] + length]
        else:
            ncut = sum(1 for s in sig if s == sig[0])
            yield jnp.where(lane < ncut * gs,
                            xp[sig[0] : sig[0] + length],
                            xp[sig[-1] : sig[-1] + length])


def _pertap_conv_vmem(x: jnp.ndarray, wt: jnp.ndarray, bias: jnp.ndarray,
                      lo: int, hi: int, shifts, out_dtype=None) -> jnp.ndarray:
    """Per-tap packed conv: one full-lane dot per original tap against a
    block-permuted-diagonal weight (see pack_conv_weight_pertap)."""
    acc = jnp.zeros((x.shape[0], wt.shape[2]), jnp.float32)
    for t, v in enumerate(_pertap_operands(x, lo, hi, shifts)):
        acc = acc + jnp.dot(v, wt[t], preferred_element_type=jnp.float32)
    return (acc + bias.astype(jnp.float32)).astype(out_dtype or x.dtype)


def _pertap_conv_vmem_x2(x: jnp.ndarray, wt: jnp.ndarray, bias: jnp.ndarray,
                         lo: int, hi: int, shifts) -> jnp.ndarray:
    """Per-tap packed conv with the hi/lo bf16 input split (serving-fidelity
    mode; see _packed_conv_vmem_x2 for the split's derivation)."""
    x = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32)
    x_hi = hi32.astype(jnp.bfloat16)
    x_lo = (x - hi32).astype(jnp.bfloat16)
    acc = jnp.zeros((x.shape[0], wt.shape[2]), jnp.float32)
    for part in (x_hi, x_lo):
        for t, v in enumerate(_pertap_operands(part, lo, hi, shifts)):
            acc = acc + jnp.dot(v, wt[t], preferred_element_type=jnp.float32)
    return acc + bias.astype(jnp.float32)


def _dispatch_conv_vmem(v, wref, bias, meta, out_dtype=None, x2=False):
    """meta: ("t", lo, hi) Toeplitz | ("p", lo, hi, shifts) per-tap."""
    if meta[0] == "t":
        if x2:
            return _packed_conv_vmem_x2(v, wref, bias, meta[1], meta[2])
        return _packed_conv_vmem(v, wref, bias, meta[1], meta[2],
                                 out_dtype=out_dtype)
    if x2:
        return _pertap_conv_vmem_x2(v, wref, bias, meta[1], meta[2], meta[3])
    return _pertap_conv_vmem(v, wref, bias, meta[1], meta[2], meta[3],
                             out_dtype=out_dtype)


def _mrf_packed_kernel(layer_meta, tile, radius, f32_storage, x2, tp_real,
                       x_hbm, mask_hbm, *refs):
    """Packed-domain fused stage. layer_meta: per-branch list of per-conv
    metas (see _dispatch_conv_vmem); refs order: for each branch, for each
    of 6 convs: (wp, bias); then out_ref, x/mask VMEM scratch, DMA sems. The
    validity mask (1 inside the real sequence) is precomputed in XLA and
    DMA'd with the same halo slicing as x -- in-kernel iota/compare patterns
    are rejected by some TPU targets."""
    n_w = sum(len(branch) for branch in layer_meta) * 2
    w_refs = refs[:n_w]
    out_ref = refs[n_w]
    x_vmem = refs[n_w + 1]
    m_vmem = refs[n_w + 2]
    sems = refs[n_w + 3]

    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile, tile + 2 * radius), :], x_vmem, sems.at[0]
    )
    cm = pltpu.make_async_copy(
        mask_hbm.at[pl.ds(i * tile, tile + 2 * radius), :], m_vmem, sems.at[1]
    )
    cp.start()
    cm.start()
    cp.wait()
    cm.wait()

    x = x_vmem[...]
    valid = m_vmem[...]
    if f32_storage:
        # Serving-fidelity storage mode: intermediates live in f32 (the
        # residual-chain ROUNDINGS, not the matmuls, are half the bf16 error
        # at the late stages -- bisect_fidelity2.py R4); MXU operands are
        # still a single bf16 rounding of the f32 value.
        x = x.astype(jnp.float32)
        valid = valid.astype(jnp.float32)

    def conv(v, wp, bias, meta):
        # f32_storage: single-bf16-rounded MXU operand, f32 result straight
        # from the accumulator (no bf16 round trip). x2 additionally splits
        # the f32 operand hi/lo into TWO bf16 MXU passes (the full
        # serving-fidelity recipe, same as the stage-4 hifi kernel).
        if x2:
            return _dispatch_conv_vmem(v, wp, bias, meta, x2=True)
        return _dispatch_conv_vmem(
            v.astype(x_vmem.dtype), wp, bias, meta,
            out_dtype=jnp.float32 if f32_storage else None)

    def chain(masked):
        ridx = 0
        acc = jnp.zeros(x.shape, jnp.float32)
        for branch in layer_meta:
            xb = x
            for j in range(0, len(branch), 2):
                xt = conv(_leaky(xb), w_refs[ridx][...],
                          w_refs[ridx + 1][...], branch[j])
                if masked:
                    xt = xt * valid
                ridx += 2
                xt = conv(_leaky(xt), w_refs[ridx][...],
                          w_refs[ridx + 1][...], branch[j + 1])
                if masked:
                    xt = xt * valid
                ridx += 2
                xb = xt + xb
            acc = acc + xb.astype(jnp.float32)
        return acc

    # (Interior-tile mask elision via lax.cond over two chain bodies was
    # tried round 3 -- isolated nomask is worth only ~1 ms/stage and the
    # doubled kernel body sent the Mosaic compile pathological; masking
    # unconditionally is the right trade.)
    del tp_real
    acc = chain(True)
    out_dtype = jnp.float32 if f32_storage else x_vmem.dtype
    out_ref[0] = (acc / len(layer_meta)).astype(out_dtype)[radius : radius + tile]


def fused_mrf_stage_packed(
    x: jnp.ndarray,
    branches: List[BranchWeights],
    kernel_sizes: Sequence[int],
    dilations: Sequence[int] = DILATIONS,
    lane_pack: int | None = None,
    tile: int = 1024,  # v5e stage4: 15.4 vs 16.5 (512) / 18.6 (256) / 23.7 (128)
    interpret: bool = False,
    f32_storage: bool = False,
    x2: bool = False,
    pertap: bool = True,
) -> jnp.ndarray:
    """Fused MRF stage evaluated in the space-to-depth packed domain.

    ``f32_storage``: keep intermediates in f32 VMEM (single-bf16 MXU
    operands, f32 output) -- the storage half of the serving-fidelity fix;
    see _mrf_packed_kernel.  ``x2`` (implies f32_storage) also evaluates
    every conv as a two-pass hi/lo bf16 split -- the FULL serving-fidelity
    recipe, ~2x the stage's MXU passes (the hifi level-2 frontier point).

    ``pertap``: evaluate each dilated (d odd > 1, p=2) conv with one
    full-lane dot per original tap (pack_conv_weight_pertap) instead of the
    dense block-Toeplitz row-shift loop -- k passes instead of ~(k-1)d/2+2,
    a 126 -> 90 MXU-pass cut across the stage at the iitp geometry. d=1
    convs keep the Toeplitz form (denser there: 2 <= kp < k).

    ``(B, T, C) -> (B, T/p, p*C)`` is a free reshape; every conv becomes a
    packed block-Toeplitz conv (nn/conv.py pack_conv_weight) with a 128-wide
    channel dim -- which both satisfies the TPU DMA lane-alignment rules the
    unpacked layout violates (C=32 slices are rejected by Mosaic) and feeds
    the MXU full 128-lane operands. All 18 convs + activations of the stage
    run per tile in VMEM with a single halo DMA.
    """
    from smart_vocoder_tpu.nn.conv import pack_conv_weight, pack_conv_weight_pertap

    bsz, t, c = x.shape
    p = lane_pack or max(1, 128 // c)
    assert t % p == 0, (t, p)
    tp = t // p

    # Pre-pack all conv weights; collect per-conv packed paddings.
    weight_args: List[jnp.ndarray] = []
    layer_meta: List[List[tuple]] = []
    radius = 0
    for (w1, b1, w2, b2), k in zip(branches, kernel_sizes):
        metas = []
        branch_halo = 0
        for j, d in enumerate(dilations):
            for w, bb, dil in ((w1[j], b1[j], d), (w2[j], b2[j], 1)):
                kk = w.shape[0]
                toep_kp = ((dil * (kk - 1) // 2 + p - 1) // p
                           + (p - 1 + dil * (kk - 1) - dil * (kk - 1) // 2) // p + 1)
                if pertap and math.gcd(dil, p) == 1 and kk < toep_kp:
                    wt, shifts, lo, hi = pack_conv_weight_pertap(w, dil, p)
                    weight_args.append(wt.astype(x.dtype))
                    metas.append(("p", lo, hi, shifts))
                else:
                    wt, lo, hi = pack_conv_weight(w, dil, p)
                    weight_args.append(wt.astype(x.dtype))
                    metas.append(("t", lo, hi))
                weight_args.append(jnp.tile(bb, p).astype(x.dtype))
                branch_halo += max(lo, hi)
        layer_meta.append(metas)
        radius = max(radius, branch_halo)
    radius = -(-radius // 8) * 8  # sublane-align the halo

    t_pad = -tp % tile
    xr = x.reshape(bsz, tp, p * c)
    xr = jnp.pad(xr, ((0, 0), (radius, radius + t_pad), (0, 0)))
    n_tiles = (tp + t_pad) // tile

    # Validity mask over padded packed rows, broadcast across lanes.
    total = tp + t_pad + 2 * radius
    mask = jnp.zeros((total, 1), x.dtype).at[radius : radius + tp].set(1.0)
    mask = jnp.broadcast_to(mask, (total, p * c))

    f32_storage = f32_storage or x2
    kernel = functools.partial(_mrf_packed_kernel, tuple(map(tuple, layer_meta)),
                               tile, radius, f32_storage, x2, tp)
    out_dtype = jnp.float32 if f32_storage else x.dtype
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weight_args)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        out_shape=jax.ShapeDtypeStruct((bsz, tp + t_pad, p * c), out_dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, p * c), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * radius, p * c), x.dtype),
            pltpu.VMEM((tile + 2 * radius, p * c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xr, mask, *weight_args)
    return out[:, :tp].reshape(bsz, t, c)


def _up_mrf_kernel(layer_meta, up_meta, post_meta, tile, radius, hifi, tp_real,
                   u_hbm, mask_hbm, *refs):
    """Fused upsample + MRF stage in the packed domain.

    Like _mrf_packed_kernel, with a transposed-conv upsampler prepended:
    the DMA'd tile is the *pre-upsample* tensor packed by p/s (same row
    count/tile geometry as the packed output -- see pack_convtranspose_weight);
    ``x = leaky(u)`` then one packed conv performs the upsampling
    (models.py:147-148 order: lrelu before ups).

    ``post_meta`` (lo, hi) optionally appends the decoder tail
    lrelu(0.01) -> packed conv_post -> tanh (models.py:156-160) computed on
    the stage result INCLUDING its halo rows (translation-invariant, so the
    halo already holds the neighbor context conv_post needs); its packed
    output occupies the leading lanes of the out block, zero-padded to the
    block width for lane alignment.
    refs: [wp_up, b_up] + per-branch (wp, bias)*6 + [wp_post]? + out_ref +
    u/mask scratch + sems.
    """
    n_w = 2 + sum(len(branch) for branch in layer_meta) * 2
    n_post = 1 if post_meta is not None else 0
    w_refs = refs[: n_w + n_post]
    out_ref = refs[n_w + n_post]
    u_vmem = refs[n_w + n_post + 1]
    m_vmem = refs[n_w + n_post + 2]
    sems = refs[n_w + n_post + 3]

    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        u_hbm.at[b, pl.ds(i * tile, tile + 2 * radius), :], u_vmem, sems.at[0]
    )
    cm = pltpu.make_async_copy(
        mask_hbm.at[pl.ds(i * tile, tile + 2 * radius), :], m_vmem, sems.at[1]
    )
    cp.start()
    cm.start()
    cp.wait()
    cm.wait()

    valid = m_vmem[...]
    out_dtype = jnp.float32 if hifi else u_vmem.dtype
    if hifi:
        valid = valid.astype(jnp.float32)
    lo_u, hi_u = up_meta

    def conv(v, wref, bias, meta):
        if hifi:
            return _dispatch_conv_vmem(v, wref, bias, meta, x2=True)
        return _dispatch_conv_vmem(v, wref, bias, meta)

    def chain(masked):
        def m(v):
            return v * valid if masked else v

        x = m(conv(_leaky(u_vmem[...]), w_refs[0][...], w_refs[1][...],
                   ("t", lo_u, hi_u)))
        ridx = 2
        acc = jnp.zeros(x.shape, jnp.float32)
        for branch in layer_meta:
            xb = x
            for j in range(0, len(branch), 2):
                xt = m(conv(_leaky(xb), w_refs[ridx][...],
                            w_refs[ridx + 1][...], branch[j]))
                ridx += 2
                xt = m(conv(_leaky(xt), w_refs[ridx][...],
                            w_refs[ridx + 1][...], branch[j + 1]))
                ridx += 2
                xb = xt + xb
            acc = acc + xb.astype(jnp.float32)
        return acc

    # (see _mrf_packed_kernel: unconditional masking; the cond variant
    # pathologically slowed Mosaic compilation)
    del tp_real
    acc = chain(True)
    result = (acc / len(layer_meta)).astype(out_dtype)
    if post_meta is None:
        out_ref[0] = result[radius : radius + tile]
        return

    # decoder tail: lrelu(0.01) -> conv_post (no bias) -> tanh, consuming the
    # halo rows as real context (radius >= post halo by construction)
    lo_p, hi_p = post_meta
    z = jnp.maximum(result, result * jnp.float32(0.01).astype(result.dtype))
    wp_post = w_refs[n_w][...]
    length = tile
    if hifi:
        zb = jax.lax.bitcast_convert_type(z, jnp.uint32)
        z32 = jax.lax.bitcast_convert_type(
            zb & jnp.uint32(0xFFFF0000), jnp.float32)
        zs = (z32.astype(jnp.bfloat16), (z - z32).astype(jnp.bfloat16))
    else:
        zs = (z,)
    accp = jnp.zeros((tile, wp_post.shape[2]), jnp.float32)
    for zz in zs:
        for tap in range(wp_post.shape[0]):
            accp = accp + jnp.dot(
                zz[radius - lo_p + tap : radius - lo_p + tap + length],
                wp_post[tap], preferred_element_type=jnp.float32)
    y = jnp.tanh(accp).astype(out_dtype)
    # (a narrow waveform-packed store -- reshape (tile, p) -> (tile*p/128,
    # 128) in-kernel -- was tried and is rejected by Mosaic: "infer-vector-
    # layout: unsupported shape cast"; pad the lanes to block width instead)
    pad_lanes = out_ref.shape[-1] - y.shape[-1]
    out_ref[0] = jnp.concatenate(
        [y, jnp.zeros((tile, pad_lanes), out_dtype)], axis=-1)


def fused_up_mrf_stage(
    u: jnp.ndarray,
    up_weight: jnp.ndarray,  # torch layout (Cin, Cout, k)
    up_bias: jnp.ndarray,
    up_kernel: int,
    up_stride: int,
    up_padding: int,
    branches: List[BranchWeights],
    kernel_sizes: Sequence[int],
    dilations: Sequence[int] = DILATIONS,
    lane_pack: int | None = None,
    tile: int = 1024,
    interpret: bool = False,
    post_weight: jnp.ndarray | None = None,  # conv_post torch (1, Cout, k)
    hifi: bool = False,
    pertap: bool = True,
) -> jnp.ndarray:
    """lrelu -> ConvTranspose upsample -> MRF stage, fused per tile in VMEM.

    ``hifi=True`` runs the stage at serving-fidelity precision: activations
    stored float32 end-to-end in VMEM, every conv evaluated as a two-pass
    hi/lo bf16 split (see _packed_conv_vmem_x2), float32 output. Costs ~2x
    the stage's MXU passes; used on the waveform-adjacent final stage where
    bf16 storage+matmul rounding dominates the serving mel-L1
    (scripts/bisect_fidelity*.py: piece-3+post bf16 = 0.0133/0.0106 of the
    0.024 serving total, vs <=0.0045 for every earlier piece).

    ``u (B, Tu, Cin)`` is the pre-upsample activation; output is
    ``(B, Tu*stride, Cout)``. Saves the XLA upsample op plus one full HBM
    round-trip of the (largest) stage tensor.

    ``post_weight`` additionally folds the decoder tail
    lrelu(0.01) -> conv_post -> tanh (models.py:156-160) into the kernel and
    returns the waveform ``(B, Tu*stride, 1)`` instead -- the standalone
    conv_post costs 16 ms at the bench shape (lane-starved + it re-triggers
    the XLA layout flip-flop as a Pallas-consuming conv).
    """
    from smart_vocoder_tpu.nn.conv import (
        pack_conv_weight,
        pack_conv_weight_pertap,
        pack_convtranspose_weight,
    )

    bsz, tu, cin = u.shape
    cout = up_weight.shape[1]
    p = lane_pack or max(1, 128 // cout)
    s = up_stride
    assert p % s == 0 and tu % (p // s) == 0, (p, s, tu)
    ps = p // s
    tp = tu // ps  # == (tu * s) // p: packed rows shared by input and output

    # hifi keeps activations f32 (the input u may itself be f32) but MXU
    # operands must be bf16 -- weight rounding is negligible (bisect R2)
    wdt = jnp.bfloat16 if hifi else u.dtype
    wp_up, lo_u, hi_u = pack_convtranspose_weight(up_weight, s, up_padding, p)
    weight_args: List[jnp.ndarray] = [
        wp_up.astype(wdt), jnp.tile(up_bias, p).astype(wdt)
    ]
    layer_meta: List[List[tuple]] = []
    radius = max(lo_u, hi_u)
    for (w1, b1, w2, b2), k in zip(branches, kernel_sizes):
        metas = []
        branch_halo = max(lo_u, hi_u)
        for j, d in enumerate(dilations):
            for w, bb, dil in ((w1[j], b1[j], d), (w2[j], b2[j], 1)):
                kk = w.shape[0]
                r_t = dil * (kk - 1) // 2
                toep_kp = (r_t + p - 1) // p + (p - 1 + dil * (kk - 1) - r_t) // p + 1
                if pertap and math.gcd(dil, p) == 1 and kk < toep_kp:
                    wp, shifts, lo, hi = pack_conv_weight_pertap(w, dil, p)
                    metas.append(("p", lo, hi, shifts))
                else:
                    wp, lo, hi = pack_conv_weight(w, dil, p)
                    metas.append(("t", lo, hi))
                weight_args.append(wp.astype(wdt))
                weight_args.append(jnp.tile(bb, p).astype(wdt))
                branch_halo += max(lo, hi)
        layer_meta.append(metas)
        radius = max(radius, branch_halo)

    post_meta = None
    if post_weight is not None:
        w_hio = jnp.transpose(post_weight, (2, 1, 0))  # (k, Cout, 1)
        wp_post, lo_p, hi_p = pack_conv_weight(w_hio, 1, p)
        post_meta = (lo_p, hi_p)
        # conv_post reads stage-result halo rows [radius-lo_p, radius+tile+hi_p);
        # those rows are exact stage outputs only if the branch chain had its own
        # full halo beneath them, so the post halo must ADD to the branch halo
        # (max() alone would let block-edge zero padding leak into conv_post
        # whenever the branch halo landed on a multiple of the 8-row round-up).
        max_branch_halo = radius
        radius = max_branch_halo + max(lo_p, hi_p)
    radius = -(-radius // 8) * 8
    if post_meta is not None:
        assert radius - max_branch_halo >= max(post_meta), (radius, max_branch_halo, post_meta)

    t_pad = -tp % tile
    ur = u.reshape(bsz, tp, ps * cin)
    ur = jnp.pad(ur, ((0, 0), (radius, radius + t_pad), (0, 0)))
    n_tiles = (tp + t_pad) // tile

    total = tp + t_pad + 2 * radius
    mask = jnp.zeros((total, 1), u.dtype).at[radius : radius + tp].set(1.0)
    mask = jnp.broadcast_to(mask, (total, p * cout))

    if post_weight is not None:
        weight_args.append(wp_post.astype(wdt))

    kernel = functools.partial(
        _up_mrf_kernel, tuple(map(tuple, layer_meta)), (lo_u, hi_u), post_meta,
        tile, radius, hifi, tp,
    )
    out_dtype = jnp.float32 if hifi else u.dtype
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weight_args)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        out_shape=jax.ShapeDtypeStruct((bsz, tp + t_pad, p * cout), out_dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, p * cout), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * radius, ps * cin), u.dtype),
            pltpu.VMEM((tile + 2 * radius, p * cout), u.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ur, mask, *weight_args)
    if post_weight is not None:
        return out[:, :tp, :p].reshape(bsz, tu * s, 1)
    return out[:, :tp].reshape(bsz, tu * s, cout)


def mrf_stage_reference(
    x: jnp.ndarray,
    branches: List[BranchWeights],
    kernel_sizes: Sequence[int],
    dilations: Sequence[int] = DILATIONS,
    mixed_f32: bool = False,
) -> jnp.ndarray:
    """Pure-jnp mirror of the fused stage (parity oracle + non-TPU fallback).

    ``mixed_f32``: f32 activations/residuals with single-bf16 MXU operands
    (the f32_storage recipe of the packed kernel, on the XLA lowering) --
    the hifi level-3 early-decoder island. ``x`` should then be f32;
    weights are rounded to bf16, conv accumulates into f32."""

    def conv(x, w, b, dil):
        k = w.shape[0]
        pad = (k * dil - dil) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16) if mixed_f32 else x,
            w.astype(jnp.bfloat16) if mixed_f32 else w,
            (1,), [(pad, pad)], rhs_dilation=(dil,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32 if mixed_f32 else None,
        )
        return y + (b.astype(jnp.float32) if mixed_f32 else b)

    acc = None
    for (w1, b1, w2, b2), k in zip(branches, kernel_sizes):
        xb = x
        for j, d in enumerate(dilations):
            xt = conv(jax.nn.leaky_relu(xb, LRELU_SLOPE), w1[j], b1[j], d)
            xt = conv(jax.nn.leaky_relu(xt, LRELU_SLOPE), w2[j], b2[j], 1)
            xb = xt + xb
        acc = xb if acc is None else acc + xb
    return acc / len(branches)
