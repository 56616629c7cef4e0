#!/usr/bin/env python
"""Headline benchmark: real-time factor of 22.05 kHz mel->wav synthesis per chip.

Runs the flagship full-size generator (configs/iitp_base.json architecture) in
bfloat16 on the available accelerator, batched inference over ~11.6 s
utterances, and prints ONE JSON line:

    {"metric": "rtf_22k05_synthesis", "value": <x realtime>, "unit": "x_realtime",
     "vs_baseline": <value / 200>}

``vs_baseline`` is measured against the BASELINE.md north-star target of
200x real time per TPU v5e chip (the reference publishes no numbers of its
own -- BASELINE.json "published": {}).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.models import build_synthesizer
from smart_vocoder_tpu.models.synthesizer import SynthesizerTrn

BATCH = int(__import__("os").environ.get("BENCH_BATCH", 32))  # throughput sweet spot measured on v5e
FRAMES = 1000         # ~11.6 s of audio per utterance at hop 256 / 22.05 kHz
WARMUP = 3
ITERS = int(__import__("os").environ.get("BENCH_ITERS", 30))
TARGET_RTF = 200.0    # BASELINE.json north star


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def wait_for_backend(attempts: int = 4, probe_timeout: float = 150.0,
                     sleep_s: float = 60.0) -> str:
    """Bounded retry around accelerator-backend init.

    The tunneled TPU backend flakes transiently (round 3's driver bench died
    on ``Unable to initialize backend 'axon': UNAVAILABLE``; the same init can
    also HANG outright). Probing in a throwaway subprocess makes both failure
    modes recoverable -- a hung child is killed by the timeout and cannot
    poison this process, whose own first ``jax.devices()`` only happens after
    a probe has succeeded. Bounded (~ attempts * (timeout + sleep), <15 min)
    so a genuinely dead backend still exits rc!=0 for the driver to record.
    """
    import os
    import subprocess
    import time as _time

    probe_src = "import jax; d = jax.devices(); print(d[0].platform, len(d))"
    last = "?"
    for i in range(attempts):
        t0 = _time.time()
        try:
            p = subprocess.run(
                [sys.executable, "-c", probe_src], capture_output=True,
                text=True, timeout=probe_timeout, env=dict(os.environ),
            )
            if p.returncode == 0 and p.stdout.strip():
                platform = p.stdout.split()[0]
                log(f"backend probe ok in {_time.time() - t0:.0f}s: {p.stdout.strip()}")
                return platform
            last = (p.stderr.strip() or f"rc={p.returncode}").splitlines()[-1][-300:]
        except subprocess.TimeoutExpired:
            last = f"backend init hang (killed after {probe_timeout:.0f}s)"
        if i < attempts - 1:
            log(f"backend probe {i + 1}/{attempts} failed: {last}; retry in {sleep_s:.0f}s")
            _time.sleep(sleep_s)
    raise RuntimeError(f"accelerator backend unavailable after {attempts} probes: {last}")


def main() -> None:
    import os

    if os.environ.get("BENCH_SKIP_PROBE") != "1":
        wait_for_backend()

    cfg = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs", "iitp_base.json")
    hps = load_config(cfg)
    from smart_vocoder_tpu.utils.compile_cache import enable_compilation_cache
    cache_dir = enable_compilation_cache(hps.tpu.get("compilation_cache", True))
    log(f"persistent compilation cache: {cache_dir or 'off'}")
    sr = hps.data.sampling_rate
    hop = hps.data.hop_length

    use_pallas = "--no-pallas" not in sys.argv
    # Fused WN encoder path: opt-in only -- measured SLOWER than XLA's convs
    # (16.6-18.7 vs 14.7 ms for the B=32 prior+flow; see Vocoder.__init__ and
    # scripts/bench_wn_path.py). End-to-end: 1556x vs 1569x.
    use_pallas_wn = use_pallas and "--pallas-wn" in sys.argv
    # --f32: full-precision serving (quality/speed tradeoff datapoint; the
    # bf16 default's deviation from f32 is the mel_l1_serving number below).
    dtype = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16
    # Headline config (round 5): serving-fidelity level 2 -- f32 prior+flow
    # (module graph, bf16 MXU operands), f32-storage early decoder, and the
    # round-3 waveform-adjacent tail islands (kernels/decoder.py hifi_tail
    # ladder; scripts/fidelity_frontier.py has the measured curve). mel-L1
    # 0.0048 at ~1480x vs level 1's 0.0087 at ~1610x: half the deviation
    # for ~8% RTF, chosen to double the fidelity-target margin. --fast drops
    # all the islands and times the pure-bf16 path (also always reported).
    hifi = (2 if use_pallas and dtype == jnp.bfloat16
            and "--fast" not in sys.argv else 0)
    net = build_synthesizer(hps, dtype=dtype, weight_norm=False)
    net_prior_f32 = build_synthesizer(hps, weight_norm=False)
    mel = jax.random.normal(jax.random.key(0), (BATCH, FRAMES, hps.data.n_mel_channels)) * 2.0 - 4.0
    lens = jnp.full((BATCH,), FRAMES, jnp.int32)
    spec = jnp.zeros((BATCH, FRAMES, hps.data.filter_length // 2 + 1))
    log(f"devices: {jax.devices()}; pallas={use_pallas}")
    # The shared fidelity weight recipe (utils/golden.py): the exact params
    # scripts/make_golden.py exported to the torch reference, so the committed
    # fixture (tests/fixtures/golden_iitp_base.npz) compares like against like.
    from smart_vocoder_tpu.utils.golden import fidelity_params

    params = fidelity_params(hps, mel, lens, spec)

    from smart_vocoder_tpu.kernels.decoder import DecoderConfig, decoder_apply

    dec_cfg = DecoderConfig.from_hparams(hps)

    def make_synth(pallas: bool, pallas_wn: bool = False, hifi_tail: int = 0):
        # hifi level >= 2 runs the prior through the f32 module graph (f32
        # storage, single-bf16 MXU matmuls at DEFAULT precision): +6 ms at
        # B=32x1000 for -0.003 mel-L1 (scripts/bisect_fidelity3.py).
        net_prior = net_prior_f32 if int(hifi_tail) >= 2 else net

        @jax.jit
        def synth(params, mel, lens, rng):
            if pallas:
                if pallas_wn:
                    from smart_vocoder_tpu.kernels.encoder import prior_flow_apply
                    from smart_vocoder_tpu.ops import sequence_mask

                    mask = sequence_mask(lens, mel.shape[1]).astype(dtype)
                    eps = jax.random.normal(
                        rng, (*mel.shape[:2], hps.model.inter_channels), jnp.float32)
                    z = prior_flow_apply(params, mel, mask, eps, 0.667, dtype=dtype)
                else:
                    def prior_latent(n, mel, lens, rng):
                        _, m_p, logs_p, mask = n.enc_p(mel, lens)
                        eps = jax.random.normal(rng, m_p.shape, jnp.float32).astype(m_p.dtype)
                        z_p = m_p + eps * jnp.exp(logs_p) * 0.667
                        return n.flow(z_p, mask, g=None, reverse=True) * mask

                    z = net_prior.apply({"params": params}, mel, lens, rng,
                                        method=prior_latent)
                wav = decoder_apply(params["dec"], z, dec_cfg, use_pallas=True,
                                    dtype=dtype, hifi_tail=hifi_tail)
            else:
                wav, _, _ = net.apply(
                    {"params": params}, mel, lens, rng,
                    noise_scale=0.667, method=SynthesizerTrn.infer,
                )
            # In-graph checksum: fetching this scalar afterwards proves the step
            # ran to completion (execution is FIFO per device). Ad-hoc op-by-op
            # reductions outside jit can hang/misreport over the tunneled backend.
            return wav, jnp.sum(wav.astype(jnp.float32))
        return synth

    synth = make_synth(use_pallas, use_pallas_wn, hifi_tail=hifi)

    rng = jax.random.key(3)
    t0 = time.time()
    try:
        out, chk = synth(params, mel, lens, rng)
        chk_val = float(chk)
    except Exception as e:  # Pallas/Mosaic compile flakiness: fall back to XLA
        if not use_pallas:
            raise
        log(f"pallas path failed ({type(e).__name__}: {e}); falling back to XLA path")
        synth = make_synth(False)
        out, chk = synth(params, mel, lens, rng)
        chk_val = float(chk)
    log(f"first compile+run: {time.time() - t0:.1f}s; out {out.shape} {out.dtype} "
        f"checksum {chk_val:.3f}")

    def timed(synth_fn):
        for i in range(WARMUP):
            out, chk = synth_fn(params, mel, lens, jax.random.fold_in(rng, i))
        float(chk)
        t0 = time.perf_counter()
        for i in range(ITERS):
            out, chk = synth_fn(params, mel, lens, jax.random.fold_in(rng, 100 + i))
        checksum = float(chk)  # host readback == all ITERS steps completed
        return (time.perf_counter() - t0) / ITERS, checksum

    dt, checksum = timed(synth)
    log(f"checksum {checksum:.3f}")

    audio_seconds = BATCH * FRAMES * hop / sr
    rtf = audio_seconds / dt
    log(f"{dt*1e3:.2f} ms/step for {audio_seconds:.1f}s audio "
        f"({BATCH}x{FRAMES} frames); samples/sec/chip {BATCH*FRAMES*hop/dt:,.0f}"
        + (" [serving-fidelity config]" if hifi else ""))

    rtf_fast = None
    if hifi:
        # max-throughput datapoint: same path minus the fidelity islands
        dt_fast, _ = timed(make_synth(use_pallas, use_pallas_wn, hifi_tail=False))
        rtf_fast = audio_seconds / dt_fast
        log(f"fast bf16 path: {dt_fast*1e3:.2f} ms/step = {rtf_fast:.0f}x RT")

    mel_l1, mel_l1_serving = fidelity_vs_reference(
        hps, net, params, synth_path_pallas=use_pallas, pallas_wn=use_pallas_wn,
        dtype=dtype, hifi=hifi,
        net_prior=net_prior_f32 if int(hifi) >= 2 else None)

    # MFU: analytic model FLOPs of the synthesis graph (utils/flops.py --
    # packing/Pallas variants inflate *executed* MACs, and Pallas FLOPs are
    # invisible to cost_analysis, so the analytic count is the honest
    # numerator) against v5e bf16 peak.
    from smart_vocoder_tpu.utils.flops import V5E_BF16_PEAK, synthesis_flops

    model_flops = synthesis_flops(hps, BATCH, FRAMES)
    tflops = model_flops / dt / 1e12
    log(f"model FLOPs/step {model_flops / 1e12:.2f} T -> {tflops:.1f} TFLOP/s "
        f"= {tflops * 1e12 / V5E_BF16_PEAK * 100:.1f}% of v5e bf16 peak")

    result = {
        "metric": "rtf_22k05_synthesis",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / TARGET_RTF, 3),
        "achieved_tflops_per_s": round(tflops, 2),
        "mfu": round(tflops * 1e12 / V5E_BF16_PEAK, 4),
    }
    if mel_l1 is not None:
        result["mel_l1_vs_reference"] = round(mel_l1, 5)
        result["fidelity_target"] = 1e-2
        suffix = ("hifi" if hifi else "f32" if dtype == jnp.float32 else "bf16")
        # mel-L1 of the EXACT path the headline timed
        result[f"mel_l1_serving_{suffix}"] = round(mel_l1_serving, 5)
    if rtf_fast is not None:
        result["rtf_fast_bf16"] = round(rtf_fast, 2)
    result.update(train_metrics())
    print(json.dumps(result))


def train_metrics() -> dict:
    """Training throughput in the SAME driver artifact as serving (VERDICT r4
    next #4): run scripts/bench_train.py (full GAN step, batch 16 x 1000
    frames, the config of record) in a bounded subprocess and merge its step
    time + MFU. Subprocess isolation keeps the ~10 GiB train-step live set and
    its compile out of this process; the persistent compilation cache makes
    the warm-path cost ~1 min. Skipped (with a log line, keys absent) on
    timeout/failure or under BENCH_SKIP_TRAIN=1 -- serving headline metrics
    never depend on the train phase."""
    import os
    import subprocess

    if os.environ.get("BENCH_SKIP_TRAIN") == "1" or "--no-train" in sys.argv:
        log("train phase: skipped by flag")
        return {}
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "bench_train.py")
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, script, "1000", "16", "10"], capture_output=True,
            text=True, timeout=float(os.environ.get("BENCH_TRAIN_TIMEOUT", 1500)),
        )
    except subprocess.TimeoutExpired:
        log("train phase: timed out (cold compile over the tunnel?); "
            "omitting train metrics")
        return {}
    if p.returncode != 0:
        tail = (p.stderr or p.stdout).strip().splitlines()[-1:]
        log(f"train phase failed rc={p.returncode}: {tail}; omitting")
        return {}
    for line in reversed(p.stdout.strip().splitlines()):
        try:
            tm = json.loads(line)
        except json.JSONDecodeError:
            continue
        if tm.get("metric") == "train_step_ms":
            log(f"train phase ({time.time() - t0:.0f}s): "
                f"{tm['value']} ms/step, mfu {tm['mfu_wallclock']}")
            return {
                "train_step_ms": tm["value"],
                "train_audio_x_realtime": tm["audio_x_realtime"],
                "train_mfu_wallclock": tm["mfu_wallclock"],
            }
    log("train phase: no JSON line found; omitting")
    return {}


def fidelity_vs_reference(hps, net, params, synth_path_pallas: bool,
                          pallas_wn: bool, dtype=jnp.bfloat16, hifi: int = 0,
                          net_prior=None):
    """mel-L1 vs the committed torch-reference golden, computed on-device.

    The fixture (scripts/make_golden.py) pins weights (the same recipe as
    utils/golden.fidelity_params above), input mel, and prior noise; the
    torch reference's f32 waveform for that triple is stored. Two numbers:

    - ``mel_l1_vs_reference``: f32 synthesis at matmul precision "highest"
      through the module graph -- implementation parity like-for-like with
      the f32 torch reference (BASELINE.json target <= 1e-2). DEFAULT
      precision computes f32 matmuls at bf16-class accuracy on both CPU and
      TPU (measured rel err ~2e-3), which would measure the precision mode,
      not the implementation.
    - ``mel_l1_serving_bf16``: the SAME comparison through the exact path the
      bench timed (bf16 + Pallas kernels) -- the serving-precision deviation,
      and a canary for kernel numerics regressions.
    """
    import os

    import numpy as np

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "fixtures", "golden_iitp_base.npz")
    if not os.path.exists(path):
        log("fidelity: no golden fixture, skipping")
        return None, None
    gz = np.load(path)
    noise_scale = float(gz["noise_scale"])

    from smart_vocoder_tpu.ops import MelConfig, mel_spectrogram

    mel_cfg = MelConfig.from_hparams(hps)
    net_f32 = build_synthesizer(hps, weight_norm=False)

    def mel_l1_of(wav, gwav):
        m_got = mel_spectrogram(wav[..., 0].astype(jnp.float32), mel_cfg)
        m_ref = mel_spectrogram(gwav[None].astype(jnp.float32), mel_cfg)
        return jnp.mean(jnp.abs(m_got - m_ref))

    @jax.jit
    def fid_f32(params, gmel, glens, geps, gwav):
        wav, _, _ = net_f32.apply(
            {"params": params}, gmel, glens, jax.random.key(0),
            noise_scale=noise_scale, eps=geps, method=SynthesizerTrn.infer,
        )
        return mel_l1_of(wav, gwav)

    @jax.jit
    def fid_serving(params, gmel, glens, geps, gwav):
        if synth_path_pallas:
            from smart_vocoder_tpu.kernels.decoder import DecoderConfig, decoder_apply

            if pallas_wn:
                from smart_vocoder_tpu.kernels.encoder import prior_flow_apply
                from smart_vocoder_tpu.ops import sequence_mask

                mask = sequence_mask(glens, gmel.shape[1]).astype(dtype)
                z = prior_flow_apply(params, gmel, mask, geps, noise_scale,
                                     dtype=dtype)
            else:
                def prior_latent(n, mel, lens, eps):
                    _, m_p, logs_p, mask = n.enc_p(mel, lens)
                    z_p = m_p + eps.astype(m_p.dtype) * jnp.exp(logs_p) * noise_scale
                    return n.flow(z_p, mask, g=None, reverse=True) * mask

                z = (net_prior or net).apply({"params": params}, gmel, glens,
                                             geps, method=prior_latent)
            wav = decoder_apply(params["dec"], z, DecoderConfig.from_hparams(hps),
                                use_pallas=True, dtype=dtype, hifi_tail=hifi)
        else:
            wav, _, _ = net.apply(
                {"params": params}, gmel, glens, jax.random.key(0),
                noise_scale=noise_scale, eps=geps, method=SynthesizerTrn.infer,
            )
        return mel_l1_of(wav, gwav)

    gmel = jnp.asarray(gz["mel"])
    glens = jnp.full((1,), gmel.shape[1], jnp.int32)
    geps = jnp.asarray(gz["eps"])
    gwav = jnp.asarray(gz["wav_ref"])
    with jax.default_matmul_precision("highest"):
        l1 = float(fid_f32(params, gmel, glens, geps, gwav))
    l1_serving = float(fid_serving(params, gmel, glens, geps, gwav))
    status = "OK" if l1 <= 1e-2 else "ABOVE TARGET"
    log(f"mel_l1_vs_reference: {l1:.5f} (f32/highest, target <= 1e-2: {status}); "
        f"serving bf16 path: {l1_serving:.5f}")
    return l1, l1_serving


if __name__ == "__main__":
    main()
