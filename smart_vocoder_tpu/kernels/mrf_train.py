"""Custom-VJP fused MRF stage for the TRAINING graph (VERDICT r4 item 5).

The serving-side fused stage (kernels/mrf.py) keeps a whole MRF stage's
activations in VMEM. This module gives that stage a hand-written backward
pass so the same fusion can be A/B'd against XLA's autodiff on the training
shapes (B=16 segment slices, reference train.py:131-176 / models.py:115-167):

  forward : the existing ``fused_mrf_stage`` kernel (activations never touch
            HBM); residuals saved = (x, weights) only -- no intermediates.
  backward: one Pallas kernel per branch.  Each (batch, time-tile) grid step
            DMAs an ``x`` tile and a ``dy`` tile with a halo (see below),
            REPLAYS the branch chain in VMEM (recompute -- cheaper than
            round-tripping 12 intermediates through HBM), then backprops
            through it: dx via correlation with tap-flipped transposed
            weights, dw/db via per-tap (C,tile)x(tile,C) MXU dots
            accumulated across the sequential TPU grid into revisited VMEM
            output blocks.

The halo is NOT the chain's receptive radius: a replayed intermediate at
depth j is only correct on the extended tile minus the radius consumed so
far, and its backward consumer reads it beyond the central tile by however
much bwd consumption remains -- the two ADD (``branch_bwd_halo``, ~22r vs
the fwd kernel's 12r).  With that halo the central ``tile`` columns of dx --
and every dw product, which only reads central rows of the grads -- are
exact.  Boundary masking mirrors the forward
kernel: rows outside [0, t_real) are zeroed after every conv, reproducing
torch's per-conv zero padding at sequence edges (reference modules.py:210-222).

Numerics match ``jax.vjp`` of ``mrf_stage_reference`` (tests/test_mrf_train.py);
adoption/rejection for the training step is decided by the same-process A/B in
scripts/ab_mrf_train.py (docs/ARCHITECTURE.md carries the table).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smart_vocoder_tpu.kernels.mrf import (
    DILATIONS,
    LRELU_SLOPE,
    BranchWeights,
    fused_mrf_stage,
)


def _leaky(x):
    return jnp.maximum(x, x * LRELU_SLOPE)


def _dleaky(x):
    # d/dx max(x, s*x) = 1 for x > 0 else s (subgradient s at 0, matching
    # XLA's leaky_relu grad, which routes x == 0 through the negative arm).
    one = jnp.ones((), x.dtype)
    return jnp.where(x > 0, one, one * LRELU_SLOPE)


def _conv_taps(x, w, b, dilation):
    """Same-length dilated conv on (L, C) via static tap loop (f32 accum)."""
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
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    return acc.astype(x.dtype)


def branch_bwd_halo(k: int, dilations: Sequence[int] = DILATIONS) -> int:
    """Halo the bwd kernel needs -- LARGER than the chain's receptive radius.

    A forward intermediate replayed at chain depth j is only correct on the
    extended tile minus the radius consumed so far (f_j), and its backward
    consumer reads it needed_j + r1_j columns beyond the central tile (the
    grads it feeds still have pairs i<j to flow through, each consuming
    r1_i + r2).  The two consumptions ADD, so the worst pair needs
    f_j + needed_j + r1_j of halo (~22r for dilations (1,3,5) vs the forward
    kernel's 12r radius)."""
    r2 = (k - 1) // 2
    r1 = [r2 * d for d in dilations]
    h = 0
    for j in range(len(dilations)):
        needed_j = sum(r1[i] + r2 for i in range(j))
        f_j = needed_j + r1[j]
        h = max(h, f_j + needed_j + r1[j], f_j + r2)
    return h


def _branch_bwd_kernel(
    k, dilations, tile, h, t_real,
    x_hbm, g_hbm, w1, b1, w2, b2, w1f, w2f,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    x_vmem, g_vmem, sem_x, sem_g,
):
    b = pl.program_id(0)
    i = pl.program_id(1)

    cp_x = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile, tile + 2 * h), :], x_vmem, sem_x)
    cp_g = pltpu.make_async_copy(
        g_hbm.at[b, pl.ds(i * tile, tile + 2 * h), :], g_vmem, sem_g)
    cp_x.start()
    cp_g.start()
    cp_x.wait()
    cp_g.wait()

    x = x_vmem[...]
    g = g_vmem[...]
    # Row validity (same formula as the forward kernel): padded-global row of
    # local row l is i*tile + l; real data occupies [h, h + t_real).
    rows = (jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
            .astype(jnp.float32) + jnp.float32(i * tile))
    valid = jnp.where(
        (rows >= jnp.float32(h)) & (rows < jnp.float32(h + t_real)),
        jnp.ones_like(rows), jnp.zeros_like(rows),
    ).astype(x.dtype)

    # -- replay the branch chain, saving per-pair (x_j, masked conv1 out) ----
    xs, hs = [], []
    xb = x
    for j, d in enumerate(dilations):
        xs.append(xb)
        hm = _conv_taps(_leaky(xb), w1[j], b1[j], d) * valid
        hs.append(hm)
        y = _conv_taps(_leaky(hm), w2[j], b2[j], 1) * valid
        xb = y + xb

    # -- backprop --------------------------------------------------------------
    r2 = (k - 1) // 2
    n_d = len(dilations)
    dw1_parts = [[None] * k for _ in range(n_d)]
    dw2_parts = [[None] * k for _ in range(n_d)]
    db1_parts, db2_parts = [None] * n_d, [None] * n_d
    dxb = g  # cotangent wrt the branch output (1/n_branches applied outside)
    for j in reversed(range(n_d)):
        d = dilations[j]
        r1 = r2 * d
        # conv2 (dilation 1): y = conv(q, w2) + b2, masked
        dy = dxb * valid
        q = _leaky(hs[j])
        dq = _conv_taps(dy, w2f[j], None, 1)
        dy_c = dy[h : h + tile]
        for t in range(k):
            dw2_parts[j][t] = jax.lax.dot_general(
                q[h + t - r2 : h + t - r2 + tile], dy_c,
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        db2_parts[j] = jnp.sum(dy_c.astype(jnp.float32), axis=0,
                               keepdims=True)
        # conv1 (dilation d): h = conv(p, w1) + b1, masked
        dh = (dq * _dleaky(hs[j])) * valid
        p = _leaky(xs[j])
        dp = _conv_taps(dh, w1f[j], None, d)
        dh_c = dh[h : h + tile]
        for t in range(k):
            dw1_parts[j][t] = jax.lax.dot_general(
                p[h + t * d - r1 : h + t * d - r1 + tile], dh_c,
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        db1_parts[j] = jnp.sum(dh_c.astype(jnp.float32), axis=0,
                               keepdims=True)
        dxb = dxb + dp * _dleaky(xs[j])

    dx_ref[0] = dxb[h : h + tile]
    first = jnp.logical_and(b == 0, i == 0)

    @pl.when(first)
    def _():
        for j in range(n_d):
            db1_ref[j] = db1_parts[j][0]
            db2_ref[j] = db2_parts[j][0]
            for t in range(k):
                dw1_ref[j, t] = dw1_parts[j][t]
                dw2_ref[j, t] = dw2_parts[j][t]

    @pl.when(jnp.logical_not(first))
    def _():
        for j in range(n_d):
            db1_ref[j] += db1_parts[j][0]
            db2_ref[j] += db2_parts[j][0]
            for t in range(k):
                dw1_ref[j, t] += dw1_parts[j][t]
                dw2_ref[j, t] += dw2_parts[j][t]


def mrf_branch_bwd(
    x: jnp.ndarray,
    g: jnp.ndarray,
    branch: BranchWeights,
    k: int,
    dilations: Sequence[int] = DILATIONS,
    tile: int = 512,
    interpret: bool = False,
):
    """Gradients of ONE ResBlock1 branch chain at ``x`` with output cotangent
    ``g``: returns (dx, (dw1, db1, dw2, db2)), all in the dtypes of the inputs
    (weight grads accumulate in f32 on-chip)."""
    bsz, t, c = x.shape
    w1, b1, w2, b2 = (a.astype(x.dtype) for a in branch)
    # Sublane-align halo AND tile: Mosaic rejects DMA slices whose row count
    # (tile + 2h) isn't a multiple of 8 ("Slice shape along dimension 1 must
    # be aligned to tiling (8)"); extra halo rows are zero-padded + masked.
    h = -(-branch_bwd_halo(k, dilations) // 8) * 8
    tile = -(-min(tile, max(8, t)) // 8) * 8
    t_pad = -t % tile
    xp = jnp.pad(x, ((0, 0), (h, h + t_pad), (0, 0)))
    gp = jnp.pad(g.astype(x.dtype), ((0, 0), (h, h + t_pad), (0, 0)))
    n_tiles = (t + t_pad) // tile
    # Tap-flipped, in/out-transposed weights: correlation == conv with these.
    w1f = jnp.flip(w1, axis=1).swapaxes(-1, -2)
    w2f = jnp.flip(w2, axis=1).swapaxes(-1, -2)

    kernel = functools.partial(
        _branch_bwd_kernel, k, tuple(dilations), tile, h, t)
    n_d = len(dilations)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        out_shape=[
            jax.ShapeDtypeStruct((bsz, t + t_pad, c), x.dtype),
            jax.ShapeDtypeStruct((n_d, k, c, c), jnp.float32),
            jax.ShapeDtypeStruct((n_d, c), jnp.float32),
            jax.ShapeDtypeStruct((n_d, k, c, c), jnp.float32),
            jax.ShapeDtypeStruct((n_d, c), jnp.float32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[
            pl.BlockSpec((1, tile, c), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_d, k, c, c), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_d, c), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_d, k, c, c), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_d, c), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * h, c), x.dtype),
            pltpu.VMEM((tile + 2 * h, c), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, gp, w1, b1, w2, b2, w1f, w2f)
    return dx[:, :t], (dw1, db1, dw2, db2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def mrf_stage_train(
    x: jnp.ndarray,
    branches: List[BranchWeights],
    kernel_sizes: Sequence[int],
    dilations: Sequence[int] = DILATIONS,
    tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused MRF stage with a hand-written VJP (training path).

    Forward == ``fused_mrf_stage`` == ``mrf_stage_reference`` on full-length
    (unmasked) sequences; backward runs one Pallas branch-bwd kernel per
    branch and sums the dx contributions."""
    return fused_mrf_stage(x, branches, kernel_sizes, dilations,
                           tile=tile, interpret=interpret)


def _stage_fwd(x, branches, kernel_sizes, dilations, tile, interpret):
    out = fused_mrf_stage(x, branches, kernel_sizes, dilations,
                          tile=tile, interpret=interpret)
    return out, (x, branches)


def _stage_bwd(kernel_sizes, dilations, tile, interpret, res, g):
    x, branches = res
    scale = jnp.asarray(1.0 / len(branches), g.dtype)
    dx = None
    d_branches = []
    for branch, k in zip(branches, kernel_sizes):
        dxb, dws = mrf_branch_bwd(
            x, g * scale, branch, k, dilations, tile=tile, interpret=interpret)
        dx = dxb if dx is None else dx + dxb
        d_branches.append(tuple(
            dw.astype(arr.dtype) for dw, arr in zip(dws, branch)))
    return dx.astype(x.dtype), d_branches


mrf_stage_train.defvjp(_stage_fwd, _stage_bwd)
