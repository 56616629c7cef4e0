"""Multi-stream live serving: N concurrent streams, ONE compiled decode.

The single-stream streaming path (``Vocoder.stream_mel_to_wav``) keeps a v5e
~97% idle at its live-TTS operating point: a B=1 window decode is launch-
overhead-bound (~115 ms regardless of chunk size) while the same chip decodes
a B=32 batch at 1600x realtime.  Serving N independent live sessions one
window at a time therefore wastes almost the whole chip.

``StreamServer`` closes that gap by batching windows from independent streams
into one ``(max_streams, chunk)`` program.  This is semantics-free: the prior
noise of frame ``t`` in stream ``s`` is ``normal(fold_in(key(seed_s), t))``
(``Vocoder._positional_eps`` -- position-pure, independent of batch row or
co-scheduled streams), the model is fully convolutional with no cross-batch
ops, and every per-stream knob (seed, speaker id, noise_scale) rides a
batch-row axis, so each stream's audio is bit-identical to running it alone
through ``stream_mel_to_wav`` with the same (chunk, overlap, seed)
(tests/test_serving.py pins this).

Scheduling: a stream's window is "ready" once ``step + overlap`` frames past
its cursor are buffered (``step = chunk - 2*overlap``), or unconditionally at
end-of-stream.  Each ``step()`` call decodes up to ``max_streams`` ready
windows -- always through the same compiled shape, idle rows masked by
length 0 -- picking the streams whose cursor is furthest behind (oldest
audio deadline first).  Latency per window is one batched decode; aggregate
throughput scales with occupancy (see scripts/bench_streaming.py --streams).

Reference product path: /root/reference/inference.ipynb cell 4 (one wav at a
time); this is the capability the reference never had.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from smart_vocoder_tpu.inference import Vocoder


@dataclass
class _Stream:
    """Per-stream cursor state; mirrors stream_mel_to_wav's locals exactly."""

    seed: int
    sid: Optional[int]
    noise_scale: float
    buf: np.ndarray          # buffered mel frames not yet fully consumed
    buf0: int = 0            # absolute frame index of buf[0]
    start: int = 0           # absolute frame cursor of the next emission
    closed: bool = False     # no more feed() calls will arrive
    done: bool = False       # all audio emitted

    def end(self) -> int:
        return self.buf0 + len(self.buf)

    def ready(self, step: int, overlap: int) -> bool:
        if self.done:
            return False
        if self.closed:
            return self.start < self.end()
        return self.end() >= self.start + step + overlap


class StreamServer:
    """Batch windows from concurrent live streams into one compiled decode.

    Usage::

        server = StreamServer(vocoder, max_streams=8, chunk=384, overlap=96)
        h = server.open(seed=7, sid=3)        # returns a stream handle
        server.feed(h, mel_piece)             # (T_i, n_mels), any sizes
        ...
        for h, wav in server.step().items():  # one batched decode
            play(h, wav)
        server.close(h)                       # end-of-stream: step() flushes

    ``step()`` returns ``{handle: waveform_piece}`` for every stream that
    emitted this round; pieces per handle concatenate to exactly
    ``mel_to_wav_chunked(full_mel, chunk, overlap, seed=...)``.
    """

    def __init__(self, vocoder: Vocoder, max_streams: int = 8,
                 chunk: int = 384, overlap: int = 96):
        assert overlap < chunk // 2, (overlap, chunk)
        assert vocoder.mesh is None, (
            "StreamServer batches over the batch axis itself; run one server "
            "per chip instead of a data-mesh Vocoder")
        self.voc = vocoder
        self.max_streams = int(max_streams)
        self.chunk = int(chunk)
        self.overlap = int(overlap)
        self.step_frames = self.chunk - 2 * self.overlap
        self.hop = int(vocoder.hps.data.hop_length)
        self.n_mels = int(vocoder.hps.data.n_mel_channels)
        self._streams: Dict[int, _Stream] = {}
        self._ids = itertools.count()
        self._with_sid = bool(getattr(vocoder.net, "use_spk_embed", False))

        inter = int(vocoder.net.inter_channels)
        # infer casts eps to m_p.dtype pre-multiply; at hifi >= 2 the prior
        # runs through the f32 module graph, so the noise scale must be f32
        # there to stay bit-identical to the B=1 path's weak python scalar
        ns_dtype = (jnp.float32 if getattr(vocoder, "hifi", 0) >= 2
                    else vocoder.dtype)
        apply_fn = vocoder._apply_fn

        def batched_windows(params, mel, lengths, seeds, starts, noise_scales,
                            sid):
            """One decode of max_streams windows; everything per-row.

            Row r's prior noise for absolute frame t is
            ``normal(fold_in(key(seeds[r]), starts[r] + t))`` -- the same
            stream the B=1 path derives in-graph
            (Vocoder._positional_eps_graph), so co-batching cannot change any
            stream's audio. noise_scales ride as a (N,1,1) array cast to the
            compute dtype: multiplying by it is bit-identical to the weak
            python scalar the single-stream program uses."""
            keys = jax.vmap(jax.random.key)(seeds)

            def row_eps(key, start):
                idx = start + jnp.arange(mel.shape[1])
                return jax.vmap(
                    lambda i: jax.random.normal(jax.random.fold_in(key, i),
                                                (inter,), jnp.float32)
                )(idx)

            eps = jax.vmap(row_eps)(keys, starts)
            ns = noise_scales.reshape(-1, 1, 1).astype(ns_dtype)
            o, mask = apply_fn(params, mel, lengths, jax.random.key(0),
                               noise_scale=ns, sid=sid, eps=eps)
            return o

        self._decode = jax.jit(batched_windows)

    # -- stream lifecycle ------------------------------------------------------
    def open(self, seed: int = 0, sid: Optional[int] = None,
             noise_scale: float = 0.667) -> int:
        """Register a new stream; returns its handle. ``sid`` selects the
        speaker on speaker-conditioned models (ignored otherwise, matching
        Vocoder semantics)."""
        h = next(self._ids)
        self._streams[h] = _Stream(
            seed=int(seed), sid=sid, noise_scale=float(noise_scale),
            buf=np.zeros((0, self.n_mels), np.float32),
        )
        return h

    def feed(self, handle: int, mel_piece: np.ndarray) -> None:
        """Append mel frames ((T, n_mels) or (1, T, n_mels)) to a stream."""
        s = self._streams[handle]
        assert not s.closed, f"stream {handle} is closed"
        piece = np.asarray(mel_piece, np.float32)
        if piece.ndim == 3:
            piece = piece[0]
        s.buf = np.concatenate([s.buf, piece])

    def close(self, handle: int) -> None:
        """Mark end-of-stream; subsequent step() calls flush the tail."""
        s = self._streams[handle]
        s.closed = True
        if s.start >= s.end():
            s.done = True
            del self._streams[handle]

    def pending(self) -> int:
        """Number of streams with a decodable window right now."""
        return sum(s.ready(self.step_frames, self.overlap)
                   for s in self._streams.values())

    def warmup(self) -> None:
        """Compile + pre-execute the batched window program (one shape)."""
        self._decode_batch([])

    # -- the scheduler ---------------------------------------------------------
    def step(self) -> Dict[int, np.ndarray]:
        """Decode up to ``max_streams`` ready windows in ONE dispatch.

        Returns {handle: float32 waveform piece} for each stream that
        emitted. Streams whose window is not yet ready are skipped; when more
        than ``max_streams`` are ready, the streams with the oldest cursor
        (furthest-behind audio deadline) go first and the rest wait for the
        next call."""
        ready = [(h, s) for h, s in self._streams.items()
                 if s.ready(self.step_frames, self.overlap)]
        if not ready:
            return {}
        ready.sort(key=lambda hs: (hs[1].start, hs[0]))
        ready = ready[: self.max_streams]
        wavs = self._decode_batch(ready)

        out: Dict[int, np.ndarray] = {}
        for (h, s), (lo, hi, wav) in zip(ready, wavs):
            keep_hi = min(hi, s.start + self.step_frames)
            out[h] = wav[(s.start - lo) * self.hop: (keep_hi - lo) * self.hop]
            s.start = keep_hi
            keep_from = max(0, s.start - self.overlap - s.buf0)
            s.buf = s.buf[keep_from:]
            s.buf0 += keep_from
            if s.closed and s.start >= s.end():
                s.done = True
                del self._streams[h]
        return out

    def _decode_batch(self, ready):
        """Pad the ready windows into the fixed (max_streams, chunk) shape and
        run the one compiled program; idle rows are length-0 (fully masked)."""
        n = self.max_streams
        mel = np.zeros((n, self.chunk, self.n_mels), np.float32)
        lengths = np.zeros((n,), np.int32)
        seeds = np.zeros((n,), np.int32)
        starts = np.zeros((n,), np.int32)
        noise_scales = np.full((n,), 0.667, np.float32)
        sids = np.zeros((n,), np.int32)
        spans = []
        for r, (h, s) in enumerate(ready):
            lo = max(0, s.start - self.overlap)
            hi = min(s.end(), s.start + self.step_frames + self.overlap)
            win = s.buf[lo - s.buf0: hi - s.buf0]
            mel[r, : len(win)] = win
            lengths[r] = hi - lo
            seeds[r] = s.seed
            starts[r] = lo
            noise_scales[r] = s.noise_scale
            if s.sid is not None:
                sids[r] = int(s.sid)
            spans.append((lo, hi))
        o = self._decode(
            self.voc.params, jnp.asarray(mel), jnp.asarray(lengths),
            jnp.asarray(seeds), jnp.asarray(starts), jnp.asarray(noise_scales),
            jnp.asarray(sids) if self._with_sid else None,
        )
        o = np.asarray(jax.device_get(o), np.float32)
        return [
            (lo, hi, o[r, : (hi - lo) * self.hop, 0])
            for r, (lo, hi) in enumerate(spans)
        ]

    # -- convenience -----------------------------------------------------------
    def run(self, feeds: Dict[int, Iterable[np.ndarray]]):
        """Drive open streams from iterables to completion.

        ``feeds`` maps handle -> iterable of mel pieces. Yields
        ``(handle, waveform_piece)`` in emission order; one feed piece is
        pulled per stream per scheduling round (live pacing), and a batched
        decode runs whenever any stream has a ready window."""
        iters = {h: iter(it) for h, it in feeds.items()}
        while iters or self.pending():
            for h in list(iters):
                try:
                    self.feed(h, next(iters[h]))
                except StopIteration:
                    del iters[h]
                    self.close(h)
            while self.pending():
                for h, wav in self.step().items():
                    yield h, wav
