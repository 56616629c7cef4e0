"""Batch assembly with static TPU shapes + background prefetch.

The reference zero-pads each batch to its longest sample (data_utils.py:83-127),
giving unbounded shape variety -- poison for XLA. Here every batch is padded to
its bucket's *upper boundary* instead, so the whole training run compiles at
most ``len(boundaries) - 1`` distinct shapes (SURVEY.md section 5,
"long-context" row). Wav padding is ``frames * hop`` keeping the exact
``wav_len == spec_len * hop`` invariant the slicing math relies on.

A small thread-pool computes host-side STFTs in parallel and a background
thread keeps a prefetch queue full (the reference uses 8 torch DataLoader
worker processes, train.py:74; STFT via numpy releases the GIL in FFT so
threads suffice and avoid fork/pickle overhead).
"""

from __future__ import annotations

import queue
import threading
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

    def __len__(self) -> int:
        return len(self.sampler)

    def _load_batch(self, indices: List[int]) -> Batch:
        with ThreadPoolExecutor(max_workers=min(self.num_workers, len(indices))) as pool:
            items = list(pool.map(self.dataset.__getitem__, indices))
        frames = self.sampler.bucket_boundary(indices)
        return pad_to_bucket(items, frames, self.hop, self.with_sid)

    def __iter__(self) -> Iterator[Batch]:
        batches = list(iter(self.sampler))
        q: "queue.Queue[Optional[Batch]]" = queue.Queue(maxsize=self.prefetch)
        err: List[BaseException] = []

        def producer():
            try:
                for idxs in batches:
                    q.put(self._load_batch(idxs))
            except BaseException as e:  # surfaced in the consumer
                err.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item
        t.join()
        if err:
            raise err[0]
