#!/usr/bin/env python
"""Same-session A/B of packed-MRF kernel micro-variants (round-3 item 2).

The packed kernels run at 75-79% MXU utilization of their (inflated) MACs;
the gap is suspected to be VPU/elementwise work serialized with the MXU:
leaky-relu (4 ops), per-conv jnp.pad copies, per-conv validity-mask
multiplies, f32->bf16 casts. Each variant removes one suspect; timings are
tunnel-safe (per-iteration rng inputs + checksum readback).

Usage: python scripts/exp_mrf_variants.py [stage] [iters] [variant ...]
Variants: base leaky2 nomask nopad f32acc all
"""

import functools
import os
import sys
import time
from typing import List

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smart_vocoder_tpu.nn.conv import pack_conv_weight

SHAPES = {1: (8000, 256), 2: (64000, 128), 3: (128000, 64), 4: (256000, 32)}
KS = (3, 7, 11)
DILATIONS = (1, 3, 5)
B = 32


def _leaky4(x):
    return jnp.maximum(x, 0) + 0.1 * jnp.minimum(x, 0)


def _leaky2(x):
    # slope < 1 makes leaky-relu a plain max: max(x, 0.1x)
    return jnp.maximum(x, x * 0.1)


def _conv_pad(x, wp, bias, lo, hi):
    length = x.shape[0]
    xp = jnp.pad(x, ((lo, hi), (0, 0)))
    acc = jnp.zeros((length, wp.shape[2]), jnp.float32)
    for i in range(wp.shape[0]):
        acc = acc + jnp.dot(xp[i : i + length, :], wp[i],
                            preferred_element_type=jnp.float32)
    return acc + bias.astype(jnp.float32)


def _conv_nopad(x, wp, bias, lo, hi):
    """No pad copy: accumulate over the largest common window; rows that a
    padded conv would compute from zeros come out WRONG here, but they live
    inside the tile halo, which the caller discards (interior-garbage
    tolerance is exactly what the halo radius buys)."""
    length = x.shape[0]
    kp = wp.shape[0]
    lc = length - (kp - 1)
    acc = jnp.zeros((lc, wp.shape[2]), jnp.float32)
    for i in range(kp):
        acc = acc + jnp.dot(x[i : i + lc, :], wp[i],
                            preferred_element_type=jnp.float32)
    # reposition: central window [lo, lo+lc) of the output; edges zero-filled
    y = jnp.pad(acc, ((lo, hi), (0, 0)))
    return y + bias.astype(jnp.float32)


def make_kernel(layer_meta, tile, radius, use_mask, leaky, conv, acc_dtype):
    def kernel(x_hbm, mask_hbm, *refs):
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
        cp.start()
        if use_mask:
            cm = pltpu.make_async_copy(
                mask_hbm.at[pl.ds(i * tile, tile + 2 * radius), :], m_vmem,
                sems.at[1]
            )
            cm.start()
        cp.wait()
        if use_mask:
            cm.wait()
            valid = m_vmem[...]

        x = x_vmem[...]
        ridx = 0
        acc = jnp.zeros(x.shape, jnp.float32)
        for branch in layer_meta:
            xb = x.astype(acc_dtype)
            for j in range(0, len(branch), 2):
                lo1, hi1 = branch[j]
                xt = conv(leaky(xb).astype(x.dtype), w_refs[ridx][...],
                          w_refs[ridx + 1][...], lo1, hi1).astype(acc_dtype)
                if use_mask:
                    xt = xt * valid.astype(acc_dtype)
                ridx += 2
                lo2, hi2 = branch[j + 1]
                xt = conv(leaky(xt).astype(x.dtype), w_refs[ridx][...],
                          w_refs[ridx + 1][...], lo2, hi2).astype(acc_dtype)
                if use_mask:
                    xt = xt * valid.astype(acc_dtype)
                ridx += 2
                xb = xt + xb
            acc = acc + xb.astype(jnp.float32)
        out_ref[0] = (acc / len(layer_meta)).astype(x.dtype)[radius : radius + tile]

    return kernel


def fused_variant(x, branches, kernel_sizes, tile=1024, use_mask=True,
                  leaky=_leaky4, conv=_conv_pad, acc_dtype=jnp.bfloat16):
    bsz, t, c = x.shape
    p = max(1, 128 // c)
    tp = t // p

    weight_args: List[jnp.ndarray] = []
    layer_meta: List[List[tuple]] = []
    radius = 0
    for (w1, b1, w2, b2), k in zip(branches, kernel_sizes):
        metas = []
        branch_halo = 0
        for j, d in enumerate(DILATIONS):
            for w, bb, dil in ((w1[j], b1[j], d), (w2[j], b2[j], 1)):
                wp, lo, hi = pack_conv_weight(w, dil, p)
                weight_args.append(wp.astype(x.dtype))
                weight_args.append(jnp.tile(bb, p).astype(x.dtype))
                metas.append((lo, hi))
                branch_halo += max(lo, hi)
        layer_meta.append(metas)
        radius = max(radius, branch_halo)
    radius = -(-radius // 8) * 8

    t_pad = -tp % tile
    xr = x.reshape(bsz, tp, p * c)
    xr = jnp.pad(xr, ((0, 0), (radius, radius + t_pad), (0, 0)))
    n_tiles = (tp + t_pad) // tile

    total = tp + t_pad + 2 * radius
    mask = jnp.zeros((total, 1), x.dtype).at[radius : radius + tp].set(1.0)
    mask = jnp.broadcast_to(mask, (total, p * c))

    kernel = make_kernel(tuple(map(tuple, layer_meta)), tile, radius, use_mask,
                         leaky, conv, acc_dtype)
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weight_args)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        out_shape=jax.ShapeDtypeStruct((bsz, tp + t_pad, p * c), x.dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, p * c), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * radius, p * c), x.dtype),
            pltpu.VMEM((tile + 2 * radius, p * c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xr, mask, *weight_args)
    return out[:, :tp].reshape(bsz, t, c)


VARIANTS = {
    "base": dict(),
    "leaky2": dict(leaky=_leaky2),
    "nomask": dict(use_mask=False),
    "nopad": dict(conv=_conv_nopad),
    "f32acc": dict(acc_dtype=jnp.float32),
    "all": dict(leaky=_leaky2, use_mask=False, conv=_conv_nopad),
    "all_f32": dict(leaky=_leaky2, use_mask=False, conv=_conv_nopad,
                    acc_dtype=jnp.float32),
}


def main():
    stage = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    names = sys.argv[3:] or list(VARIANTS)
    t, c = SHAPES[stage]

    @jax.jit
    def make_branches(key):
        ks = jax.random.split(key, 12 * len(KS))
        branches, i = [], 0
        for k in KS:
            w1 = jax.random.normal(ks[i], (3, k, c, c), jnp.bfloat16) * 0.05; i += 1
            b1 = jax.random.normal(ks[i], (3, c), jnp.bfloat16) * 0.05; i += 1
            w2 = jax.random.normal(ks[i], (3, k, c, c), jnp.bfloat16) * 0.05; i += 1
            b2 = jax.random.normal(ks[i], (3, c), jnp.bfloat16) * 0.05; i += 1
            branches.append((w1, b1, w2, b2))
        return branches

    branches = make_branches(jax.random.key(0))

    def timeit(stage_fn):
        @jax.jit
        def run(branches, rng):
            x = jax.random.normal(rng, (B, t, c), jnp.bfloat16) * 0.3
            return jnp.sum(stage_fn(x, branches).astype(jnp.float32))

        rng = jax.random.key(1)
        t0 = time.time()
        chk = float(run(branches, rng))
        compile_s = time.time() - t0
        for i in range(3):
            s_dev = run(branches, jax.random.fold_in(rng, i))
        float(s_dev)
        t0 = time.perf_counter()
        for i in range(iters):
            s_dev = run(branches, jax.random.fold_in(rng, 100 + i))
        float(s_dev)
        return (time.perf_counter() - t0) / iters * 1e3, compile_s, chk

    ms, _, _ = timeit(lambda x, br: x)
    print(f"stage{stage} ({t}x{c}) B={B}: rng-gen baseline {ms:.2f} ms", flush=True)

    # reference checksum for central-sample parity across variants (interior
    # correctness; nomask/nopad variants legitimately differ at edges)
    from smart_vocoder_tpu.kernels import fused_mrf_stage_packed
    ms, cs, chk = timeit(lambda x, br: fused_mrf_stage_packed(x, br, KS))
    print(f"shipped        : {ms:8.2f} ms  (compile {cs:.0f}s, chk {chk:.0f})",
          flush=True)

    for name in names:
        kw = VARIANTS[name]
        try:
            ms, cs, chk = timeit(
                functools.partial(fused_variant, kernel_sizes=KS, **kw))
            print(f"{name:15s}: {ms:8.2f} ms  (compile {cs:.0f}s, chk {chk:.0f})",
                  flush=True)
        except Exception as e:
            print(f"{name:15s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
