#!/usr/bin/env python
"""Streaming/live-TTS operating-point bench: first-audio latency vs RTF.

stream_mel_to_wav emits its first audio once chunk-overlap frames are
buffered; smaller chunks cut latency but decode each frame up to
chunk/(chunk-2*overlap) times (window redundancy) and run the TPU at B=1 on
short sequences (launch-overhead-bound). This prints a table of operating
points for the full-size model; docs/ARCHITECTURE.md carries the recommended
live-serving config.

Latency model per row:
  buffer_ms  = (chunk - overlap) * hop / sr * 1000   (frames to first window)
  compute_ms = measured wall time of one window decode (B=1, `chunk` frames)
  first_audio_ms = buffer_ms + compute_ms  (mel arrives in real time)
  rtf_steady = step*hop/sr / per-window wall  (throughput while streaming)

Multi-stream mode (--streams): N concurrent live sessions share ONE
(N, chunk) window program through serving.StreamServer -- the B=1 decode is
launch-overhead-bound, so co-batching streams multiplies aggregate
throughput at nearly flat window latency. Table per (N, chunk, overlap):
  window_ms     = wall time of one batched step() (all N windows decode)
  stream_rtf    = step*hop/sr / window  (each stream's realtime margin)
  aggregate_rtf = N * stream_rtf       (chip-level realtime throughput)
It also re-runs the batched-vs-sequential equality check from
tests/test_serving.py on the real device and prints the measured max |diff|.

Usage: python scripts/bench_streaming.py [iters]
       python scripts/bench_streaming.py --streams [N,N,...] [--point C:O]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.inference import Vocoder

_ap = argparse.ArgumentParser()
_ap.add_argument("iters", nargs="?", type=int, default=20)
_ap.add_argument("--streams", nargs="?", const="1,2,4,8,16,32", default=None,
                 help="run the multi-stream sweep over these N values")
_ap.add_argument("--point", action="append", default=None,
                 help="chunk:overlap operating point(s) for --streams "
                      "(default 384:96 and 1024:128)")
_ap.add_argument("--no-check", action="store_true",
                 help="skip the batched-vs-sequential equality check")
ARGS = _ap.parse_args()
ITERS = ARGS.iters
# Round-4 sweep extends BELOW 384/96 (VERDICT r3 next #9): overlaps under the
# ~96-frame analytic receptive radius are approximate at seams -- the `seam`
# column measures it (max |chunked - full| / RMS(full) on a 1536-frame decode
# with position-pinned noise), so the table shows exactly what each latency
# point costs in fidelity.
POINTS = [(1024, 128), (384, 96), (256, 96),
          (256, 64), (224, 64), (192, 64), (160, 48)]
if os.environ.get("STREAM_POINTS"):  # e.g. "1024:128,384:96,160:48"
    POINTS = [tuple(int(v) for v in p.split(":"))
              for p in os.environ["STREAM_POINTS"].split(",")]


def _bench_streams(voc, sr, hop, points, ns, iters, check=True):
    """Multi-stream sweep: one StreamServer per (N, chunk, overlap) point,
    every stream pre-fed so a full batch is ready each round; step() ends in
    a host readback, and every window has fresh content (the cursor advances
    through fresh random mel), so identical-input short-circuiting cannot
    fire."""
    from smart_vocoder_tpu.serving import StreamServer

    rng = np.random.default_rng(1)
    print(f"{'streams':>7} {'chunk':>6} {'ovl':>4} {'window_ms':>10} "
          f"{'stream_rtf':>10} {'aggregate_rtf':>13}", flush=True)
    results = []
    for chunk, overlap in points:
        step = chunk - 2 * overlap
        for n in ns:
            server = StreamServer(voc, max_streams=n, chunk=chunk,
                                  overlap=overlap)
            need = (4 + iters + 1) * step + chunk
            handles = [server.open(seed=i) for i in range(n)]
            for i, h in enumerate(handles):
                server.feed(h, rng.normal(-4, 2, (need, 80)).astype(np.float32))
            for _ in range(4):  # compile + settle
                server.step()
            t0 = time.perf_counter()
            for _ in range(iters):
                out = server.step()
                assert len(out) == n
            wall = (time.perf_counter() - t0) / iters
            stream_rtf = (step * hop / sr) / wall
            print(f"{n:>7} {chunk:>6} {overlap:>4} {wall * 1e3:>10.1f} "
                  f"{stream_rtf:>10.1f} {n * stream_rtf:>13.1f}", flush=True)
            results.append({"streams": n, "chunk": chunk, "overlap": overlap,
                            "window_ms": wall * 1e3,
                            "aggregate_rtf": n * stream_rtf})

    if check:
        # equality on the real device: 2 streams co-batched on an 8-row
        # server vs each alone through the B=1 stream_mel_to_wav program
        chunk, overlap = points[0]
        server = StreamServer(voc, max_streams=8, chunk=chunk, overlap=overlap)
        mels = [rng.normal(-4, 2, (3 * chunk, 80)).astype(np.float32)
                for _ in range(2)]
        hs = [server.open(seed=11 + i) for i in range(2)]
        got = {h: [] for h in hs}
        for h, wav in server.run({h: iter([m]) for h, m in zip(hs, mels)}):
            got[h].append(wav)
        worst = 0.0
        for h, m, seed in zip(hs, mels, (11, 12)):
            want = np.concatenate(list(voc.stream_mel_to_wav(
                [m], chunk=chunk, overlap=overlap, seed=seed)))
            have = np.concatenate(got[h])
            assert have.shape == want.shape
            worst = max(worst, float(np.max(np.abs(have - want))))
        print(f"batched-vs-sequential max |diff| (device): {worst:.2e}",
              flush=True)
    return results


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hps = load_config(os.path.join(root, "configs", "iitp_base.json"))
    sr, hop = hps.data.sampling_rate, hps.data.hop_length

    from smart_vocoder_tpu.models import build_synthesizer
    from smart_vocoder_tpu.utils.golden import fidelity_params

    t0c = 64
    mel0 = jnp.zeros((1, t0c, 80))
    spec0 = jnp.zeros((1, t0c, 513))
    lens0 = jnp.full((1,), t0c, jnp.int32)
    params = fidelity_params(hps, mel0, lens0, spec0)

    if ARGS.streams is not None:
        points = [tuple(int(v) for v in p.split(":"))
                  for p in (ARGS.point or ["384:96", "1024:128"])]
        ns = [int(v) for v in ARGS.streams.split(",")]
        voc = Vocoder(hps, params, dtype=jnp.bfloat16,
                      buckets=tuple(sorted({c for c, _ in points})),
                      fold=True, use_pallas=True)
        _bench_streams(voc, sr, hop, points, ns, ITERS,
                       check=not ARGS.no_check)
        return

    chunks = sorted({c for c, _ in POINTS})
    # fidelity_params are already folded; fold_weight_norm is idempotent on
    # plain weights, so fold=True just builds the weight_norm=False net
    voc = Vocoder(hps, params, dtype=jnp.bfloat16, buckets=tuple(chunks),
                  fold=True, use_pallas=True)

    rng = np.random.default_rng(0)

    # seam-fidelity reference: one long decode with position-pinned noise --
    # identical to what chunked windows reconstruct when overlap covers the
    # receptive radius, so any deviation is pure seam error
    t_full = 1536
    mel_long = rng.normal(-4, 2, (t_full, 80)).astype(np.float32)
    eps_full = voc._positional_eps(0, 0, t_full)
    full = voc.mel_to_wav(mel_long[None], np.array([t_full]),
                          noise_scale=0.667, eps=eps_full[None])[0]
    full_rms = float(np.sqrt(np.mean(full ** 2)))

    print(f"{'chunk':>6} {'ovl':>4} {'step':>5} {'buffer_ms':>10} "
          f"{'compute_ms':>11} {'first_ms':>9} {'rtf_steady':>10} "
          f"{'redund':>7} {'seam':>9}", flush=True)
    voc.warmup()  # pre-compile + pre-dispatch every window program
    for chunk, overlap in POINTS:
        step = chunk - 2 * overlap
        mel = rng.normal(-4, 2, (chunk, 80)).astype(np.float32)
        for i in range(3):
            _ = voc._synth_window(mel + i * 1e-3, 0, chunk, 0.667, None, i)
        t0 = time.perf_counter()
        for i in range(ITERS):
            w = voc._synth_window(mel + (100 + i) * 1e-3, i, chunk, 0.667,
                                  None, i)
        # _synth_window does a real device_get (host barrier)
        wall = (time.perf_counter() - t0) / ITERS
        buffer_ms = (chunk - overlap) * hop / sr * 1e3
        compute_ms = wall * 1e3
        rtf = (step * hop / sr) / wall
        redund = chunk / step
        ck = voc.mel_to_wav_chunked(mel_long, chunk=chunk, overlap=overlap,
                                    noise_scale=0.667, seed=0)
        seam = float(np.max(np.abs(ck - full))) / full_rms
        print(f"{chunk:>6} {overlap:>4} {step:>5} {buffer_ms:>10.0f} "
              f"{compute_ms:>11.1f} {buffer_ms + compute_ms:>9.0f} "
              f"{rtf:>10.0f} {redund:>7.1f}x {seam:>9.1e}", flush=True)


if __name__ == "__main__":
    main()
