#!/usr/bin/env python
"""Honest phase breakdown of the GAN train step on the TPU.

Times jitted sub-graphs (full step / G forward / G forward+backward /
D forward / D forward+grad) with tunnel-safe methodology: per-iteration rng
variation and host-readback sync (see bench.py).

Usage: python scripts/profile_train.py [frames] [batch] [iters]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.models import MultiPeriodDiscriminator, build_synthesizer
from smart_vocoder_tpu.ops import MelConfig, spec_to_mel
from smart_vocoder_tpu.training import make_optimizer, make_train_step
from smart_vocoder_tpu.training.step import Batch, init_train_state

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# optional label-substring filter (each sub-graph is a multi-minute compile
# over the tunnel; select e.g. "step" / "G" / "D" to fit a wall-clock budget)
ONLY = sys.argv[4] if len(sys.argv) > 4 else ""


def main():
    cfg = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "configs", "iitp_base.json")
    hps = load_config(cfg)
    hps.train.batch_size = BATCH
    hop = hps.data.hop_length
    seg = hps.train.segment_size
    mel_cfg = MelConfig.from_hparams(hps)

    dtype = jnp.bfloat16
    net_g = build_synthesizer(hps, dtype=dtype)
    net_d = MultiPeriodDiscriminator(dtype=dtype)
    tx_g, tx_d = make_optimizer(hps), make_optimizer(hps)

    make = jax.jit(lambda k: Batch(
        spec=jax.random.uniform(k, (BATCH, FRAMES, 513), jnp.float32, 0.0, 2.0),
        spec_lengths=jnp.full((BATCH,), FRAMES, jnp.int32),
        wav=jax.random.uniform(k, (BATCH, FRAMES * hop, 1), jnp.float32, -0.5, 0.5),
        wav_lengths=jnp.full((BATCH,), FRAMES * hop, jnp.int32),
        sid=None,
    ))
    b = make(jax.random.key(0))
    state = jax.jit(
        lambda k, b: init_train_state(hps, net_g, net_d, tx_g, tx_d, k, b)
    )(jax.random.key(1), b)
    print("init done", flush=True)

    def timeit(fn, label):
        if ONLY and ONLY not in label:
            return
        rng = jax.random.key(7)
        t0 = time.time()
        float(fn(rng))
        comp = time.time() - t0
        for i in range(3):
            s = fn(jax.random.fold_in(rng, i))
        float(s)
        t0 = time.perf_counter()
        for i in range(ITERS):
            s = fn(jax.random.fold_in(rng, 100 + i))
        float(s)
        print(f"{label:28s}: {(time.perf_counter()-t0)/ITERS*1e3:8.2f} ms "
              f"(compile {comp:.0f}s)", flush=True)

    # full step (no donation: state reused across iterations)
    step = jax.jit(make_train_step(hps, net_g, net_d, tx_g, tx_d))
    timeit(lambda rng: step(state, b, rng)[1]["loss/g/total"], "full step")

    mel = spec_to_mel(b.spec, mel_cfg)

    def g_fwd(params_g, rng):
        out = net_g.apply({"params": params_g}, mel, b.spec_lengths, b.spec,
                          b.spec_lengths, rng, sid=None)
        y_hat = out[0]
        return jnp.sum(y_hat.astype(jnp.float32))

    timeit(jax.jit(lambda rng: g_fwd(state.params_g, rng)), "G forward")
    timeit(jax.jit(lambda rng: jnp.sum(
        jax.grad(g_fwd)(state.params_g, rng)["dec"]["conv_pre"]["bias"]
        .astype(jnp.float32))), "G forward+backward")

    y = jax.random.uniform(jax.random.key(8), (BATCH, seg, 1), jnp.float32, -0.5, 0.5)

    def d_fwd(params_d, rng):
        y_hat = jax.random.uniform(rng, (BATCH, seg, 1), jnp.float32, -0.5, 0.5)
        r, g, fr, fg = net_d.apply({"params": params_d}, y, y_hat)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in r + g)

    timeit(jax.jit(lambda rng: d_fwd(state.params_d, rng)), "D forward (r+g)")
    timeit(jax.jit(lambda rng: jnp.sum(
        jax.grad(d_fwd)(state.params_d, rng)["discriminators_0"]["convs_0"]["bias"]
        .astype(jnp.float32))), "D forward+backward")

    # ---- sub-phase rows (VERDICT r2 item 4): where the G forward/backward
    # time goes. Full-length WN stacks (enc_p/enc_q/flow) vs the 32-frame
    # sliced decoder vs the in-loss STFT/mel.
    params_g = state.params_g

    def sub(label, fn, wrt="enc_p"):
        """fn(params, rng) -> array; time fwd and fwd+bwd."""
        timeit(jax.jit(lambda rng: jnp.sum(fn(params_g, rng).astype(jnp.float32))),
               f"{label} fwd")
        timeit(jax.jit(lambda rng: jnp.sum(jax.tree.leaves(
            jax.grad(lambda p, r: jnp.sum(fn(p, r).astype(jnp.float32)))(params_g, rng)[wrt]
        )[0].astype(jnp.float32))), f"{label} fwd+bwd")

    def enc_p_fn(p, rng):
        return net_g.apply({"params": p}, mel, b.spec_lengths,
                           method=lambda n, m, l: n.enc_p(m, l)[1])

    def enc_q_fn(p, rng):
        return net_g.apply(
            {"params": p}, b.spec, b.spec_lengths, rng,
            method=lambda n, s, l, r: n.enc_q(s, l, r, g=None)[0])

    z0 = jax.random.normal(jax.random.key(9),
                           (BATCH, FRAMES, hps.model.inter_channels), dtype)
    mask1 = jnp.ones((BATCH, FRAMES, 1), dtype)

    def flow_fn(p, rng):
        z = z0 + jax.random.normal(rng, z0.shape, dtype) * 0.01
        return net_g.apply({"params": p}, z, mask1,
                           method=lambda n, z, m: n.flow(z, m, g=None))

    zs = jax.random.normal(jax.random.key(10),
                           (BATCH, seg // hop, hps.model.inter_channels), dtype)

    def dec_fn(p, rng):
        z = zs + jax.random.normal(rng, zs.shape, dtype) * 0.01
        return net_g.apply({"params": p}, z,
                           method=lambda n, z: n.dec(z, g=None))

    sub("enc_p (mel->prior)", enc_p_fn, "enc_p")
    sub("enc_q (spec->z)", enc_q_fn, "enc_q")
    sub("flow (fwd dir)", flow_fn, "flow")
    sub("dec (32-frame slice)", dec_fn, "dec")

    from smart_vocoder_tpu.ops import mel_spectrogram

    def stft_fn(rng):
        w = jax.random.uniform(rng, (BATCH, seg), jnp.float32, -0.5, 0.5)
        return jnp.sum(mel_spectrogram(w, mel_cfg).astype(jnp.float32))

    timeit(jax.jit(stft_fn), "mel_spectrogram(y_hat)")
    timeit(jax.jit(lambda rng: jnp.sum(jax.grad(
        lambda w: jnp.sum(mel_spectrogram(w, mel_cfg).astype(jnp.float32))
    )(jax.random.uniform(rng, (BATCH, seg), jnp.float32, -0.5, 0.5))
        .astype(jnp.float32))), "mel_spectrogram fwd+bwd")

    def spec2mel_fn(rng):
        s = jax.random.uniform(rng, (BATCH, FRAMES, 513), jnp.float32, 0.0, 2.0)
        return jnp.sum(spec_to_mel(s, mel_cfg).astype(jnp.float32))

    timeit(jax.jit(spec2mel_fn), "spec_to_mel(full)")


if __name__ == "__main__":
    main()
