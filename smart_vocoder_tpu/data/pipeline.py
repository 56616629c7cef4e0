"""Batch assembly with static TPU shapes + background prefetch.

The reference zero-pads each batch to its longest sample (data_utils.py:83-127),
giving unbounded shape variety -- poison for XLA. Here every batch is padded to
its bucket's *upper boundary* instead, so the whole training run compiles at
most ``len(boundaries) - 1`` distinct shapes (SURVEY.md section 5,
"long-context" row). Wav padding is ``frames * hop`` keeping the exact
``wav_len == spec_len * hop`` invariant the slicing math relies on.

A persistent thread-pool decodes/STFTs items for several batches ahead
(window = ``prefetch``), and a producer thread collates them in order into a
bounded queue (the reference uses 8 torch DataLoader worker processes,
train.py:74; numpy FFT releases the GIL so threads suffice and avoid
fork/pickle overhead). The pool lives for the loader's lifetime -- no
per-batch executor churn.
"""

from __future__ import annotations

import queue
import threading
import warnings
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence

import numpy as np

from smart_vocoder_tpu.data.dataset import AudioSpecDataset
from smart_vocoder_tpu.data.sampler import BucketSampler
from smart_vocoder_tpu.training.step import Batch


def pad_to_bucket(
    items: Sequence[tuple],
    frames: int,
    hop: int,
    with_sid: bool,
) -> Batch:
    """Collate (spec, wav, sid) tuples into one zero-padded static batch.

    Sorted by wav length descending like AudioSpecCollate (data_utils.py:94-96).
    Samples longer than the bucket boundary are truncated with a warning --
    that indicates a wrong length estimate upstream (see
    AudioSpecDataset._estimate_lengths), not a normal condition.
    """
    import jax.numpy as jnp

    items = sorted(items, key=lambda it: it[1].shape[0], reverse=True)
    n = len(items)
    n_bins = items[0][0].shape[1]
    spec = np.zeros((n, frames, n_bins), np.float32)
    wav = np.zeros((n, frames * hop, 1), np.float32)
    spec_lengths = np.zeros((n,), np.int32)
    wav_lengths = np.zeros((n,), np.int32)
    sid = np.zeros((n,), np.int32) if with_sid else None

    for i, (s, w, s_id) in enumerate(items):
        if s.shape[0] > frames:
            warnings.warn(
                f"sample with {s.shape[0]} spec frames exceeds its bucket "
                f"boundary {frames}; truncating. Length estimation and the "
                f"bucket assignment disagree -- check the wav header parse.",
                stacklevel=2,
            )
        t = min(s.shape[0], frames)
        spec[i, :t] = s[:t]
        wav[i, : t * hop] = w[: t * hop]
        spec_lengths[i] = t
        wav_lengths[i] = t * hop
        if with_sid:
            sid[i] = 0 if s_id is None else s_id

    return Batch(
        spec=jnp.asarray(spec),
        spec_lengths=jnp.asarray(spec_lengths),
        wav=jnp.asarray(wav),
        wav_lengths=jnp.asarray(wav_lengths),
        sid=jnp.asarray(sid) if sid is not None else None,
    )


class BucketedLoader:
    """Iterable over static-shape Batches for one epoch at a time."""

    def __init__(
        self,
        dataset: AudioSpecDataset,
        sampler: BucketSampler,
        with_sid: bool = False,
        num_workers: int = 8,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.with_sid = with_sid
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.hop = dataset.hop_length
        self._pool = ThreadPoolExecutor(
            max_workers=num_workers, thread_name_prefix="loader"
        )

    def __len__(self) -> int:
        return len(self.sampler)

    def __iter__(self) -> Iterator[Batch]:
        return self.iter_from(0)

    def iter_from(self, skip: int = 0) -> Iterator[Batch]:
        """Iterate this epoch's batches starting at batch index ``skip``
        (deterministic resume mid-epoch: the sampler order is epoch-seeded,
        so skipping replays exactly the already-consumed prefix)."""
        batches = list(iter(self.sampler))[skip:]
        q: "queue.Queue[Optional[Batch]]" = queue.Queue(maxsize=self.prefetch)
        err: List[BaseException] = []
        stop = threading.Event()  # consumer gone: unblock + drain the producer

        def put(item) -> bool:
            """q.put that aborts when the consumer abandoned the iterator --
            a plain blocking put would leave this thread pinned on a full
            queue forever (one leaked thread + prefetch batches per
            abandonment; _evaluate abandons an iterator every eval)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                # Item futures stay ``prefetch + 1`` batches ahead of the
                # collation point so the pool is never idle while the
                # consumer drains the queue.
                pending: deque = deque()
                it = iter(batches)

                def submit_next() -> bool:
                    idxs = next(it, None)
                    if idxs is None:
                        return False
                    futs = [
                        self._pool.submit(self.dataset.__getitem__, i)
                        for i in idxs
                    ]
                    pending.append((idxs, futs))
                    return True

                for _ in range(self.prefetch + 1):
                    if not submit_next():
                        break
                while pending and not stop.is_set():
                    idxs, futs = pending.popleft()
                    items = [f.result() for f in futs]
                    frames = self.sampler.bucket_boundary(idxs)
                    if not put(pad_to_bucket(items, frames, self.hop, self.with_sid)):
                        break
                    submit_next()
                for _, futs in pending:  # consume abandoned futures
                    for f in futs:
                        f.cancel()
            except BaseException as e:  # surfaced in the consumer
                err.append(e)
            finally:
                put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
            t.join()
            if err:
                raise err[0]
        finally:
            # Runs on GeneratorExit too (break / next(iter(...)) patterns):
            # release the producer and let it wind down.
            stop.set()
            t.join(timeout=5.0)
