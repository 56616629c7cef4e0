"""Tests for the data pipeline: dataset, bucket sampler, static-shape loader."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from smart_vocoder_tpu.config import HParams
from smart_vocoder_tpu.data import (
    AudioSpecDataset,
    BucketSampler,
    BucketedLoader,
    load_filepaths,
)

SR = 22050
HOP = 256


def write_wavs(tmp_path, lengths_frames, sid=None):
    """Write int16 sine wavs of given spec-frame lengths; return filelist path."""
    paths = []
    for i, frames in enumerate(lengths_frames):
        n = frames * HOP
        t = np.arange(n) / SR
        wav = (np.sin(2 * np.pi * 220 * (i + 1) * t) * 12000).astype(np.int16)
        p = os.path.join(tmp_path, f"utt_{i}.wav")
        wavfile.write(p, SR, wav)
        paths.append(p)
    filelist = os.path.join(tmp_path, "files.txt")
    with open(filelist, "w") as f:
        for i, p in enumerate(paths):
            f.write(f"{p}|{sid[i]}\n" if sid is not None else p + "\n")
    return filelist


def data_hps():
    return HParams(
        max_wav_value=32768.0, sampling_rate=SR, filter_length=1024,
        hop_length=HOP, win_length=1024,
    )


class TestDataset:
    def test_load_and_shapes(self, tmp_path):
        filelist = write_wavs(str(tmp_path), [40, 60, 100])
        ds = AudioSpecDataset(filelist, data_hps())
        assert len(ds) == 3
        spec, wav, sid = ds[0]
        assert spec.shape[1] == 513
        assert wav.shape == (spec.shape[0] * HOP, 1)
        assert sid is None
        assert np.abs(wav).max() <= 1.0

    def test_length_estimation_close(self, tmp_path):
        filelist = write_wavs(str(tmp_path), [50, 80])
        ds = AudioSpecDataset(filelist, data_hps())
        for i in range(len(ds)):
            spec, _, _ = ds[i]
            # file-size estimate includes the wav header (~44 bytes -> +0 frames)
            assert abs(ds.lengths[i] - spec.shape[0]) <= 1

    def test_sid_parsing(self, tmp_path):
        filelist = write_wavs(str(tmp_path), [40, 40], sid=[3, 7])
        ds = AudioSpecDataset(filelist, data_hps())
        sids = sorted(ds.entries[i][1] for i in range(2))
        assert sids == [3, 7]

    def test_glob_expansion(self, tmp_path):
        write_wavs(str(tmp_path), [40, 40, 40])
        filelist = os.path.join(str(tmp_path), "glob.txt")
        with open(filelist, "w") as f:
            f.write(os.path.join(str(tmp_path), "*.wav") + "\n")
        entries = load_filepaths(filelist)
        assert len(entries) == 3

    def test_spec_cache_roundtrip(self, tmp_path):
        filelist = write_wavs(str(tmp_path), [40])
        ds = AudioSpecDataset(filelist, data_hps(), cache_specs=True)
        spec1, _, _ = ds[0]
        cache = ds.entries[0][0] + ".spec.npy"
        assert os.path.exists(cache)
        spec2, _, _ = ds[0]  # served from cache
        np.testing.assert_array_equal(spec1, spec2)

    def test_sr_mismatch_raises(self, tmp_path):
        p = os.path.join(str(tmp_path), "bad.wav")
        wavfile.write(p, 16000, np.zeros(16000, np.int16))
        filelist = os.path.join(str(tmp_path), "bad.txt")
        with open(filelist, "w") as f:
            f.write(p + "\n")
        ds = AudioSpecDataset(filelist, data_hps())
        with pytest.raises(ValueError, match="SR"):
            ds[0]


class TestBucketSampler:
    BOUNDARIES = [32, 300, 400, 500]

    def test_drops_out_of_range(self):
        lengths = [10, 100, 350, 450, 9000]
        s = BucketSampler(lengths, batch_size=1, boundaries=list(self.BOUNDARIES))
        batched = [i for b in s for i in b]
        assert 0 not in batched and 4 not in batched
        assert set(batched) == {1, 2, 3}

    def test_bucket_padding_and_replica_split(self):
        lengths = [100] * 5 + [350] * 3
        world = 2
        samplers = [
            BucketSampler(lengths, batch_size=2, boundaries=list(self.BOUNDARIES),
                          num_replicas=world, rank=r)
            for r in range(world)
        ]
        for s in samplers:
            s.set_epoch(3)
        all_batches = [list(iter(s)) for s in samplers]
        # padded totals: bucket0 5->8, bucket1 3->4 => 12 total, 6 per rank, 3 batches
        assert all(len(b) == 3 for b in all_batches)
        seen = [i for b in all_batches for batch in b for i in batch]
        assert set(seen) == set(range(8))
        # every batch stays within one bucket
        for b in all_batches:
            for batch in b:
                bucket_ids = {s._bucket_of(lengths[i]) for i in batch}
                assert len(bucket_ids) == 1

    def test_epoch_determinism(self):
        lengths = [100] * 16
        def batches(epoch):
            s = BucketSampler(lengths, 4, list(self.BOUNDARIES))
            s.set_epoch(epoch)
            return list(iter(s))
        assert batches(5) == batches(5)
        assert batches(5) != batches(6)

    def test_bucket_boundary_lookup(self):
        lengths = [100, 350]
        s = BucketSampler(lengths, 1, list(self.BOUNDARIES))
        assert s.bucket_boundary([0]) == 300
        assert s.bucket_boundary([1]) == 400


class TestLoader:
    def test_static_shapes(self, tmp_path):
        filelist = write_wavs(str(tmp_path), [40, 50, 60, 200, 210, 220])
        ds = AudioSpecDataset(filelist, data_hps())
        sampler = BucketSampler(ds.lengths, batch_size=3, boundaries=[32, 100, 300])
        sampler.set_epoch(1)
        loader = BucketedLoader(ds, sampler, num_workers=2)
        shapes = set()
        for batch in loader:
            assert batch.spec.shape[0] == 3
            assert batch.wav.shape[1] == batch.spec.shape[1] * HOP
            assert int(batch.spec_lengths.max()) <= batch.spec.shape[1]
            shapes.add(batch.spec.shape[1])
        assert shapes <= {100, 300}
        assert len(shapes) == 2


class TestLoaderAbandonment:
    def test_abandoned_iterator_releases_producer_thread(self, tmp_path):
        """next(iter(loader)) then dropping the iterator (the _evaluate
        pattern) must not leave the producer thread blocked on a full queue."""
        import gc
        import threading
        import time

        filelist = write_wavs(str(tmp_path), [40, 50, 60, 200, 210, 220] * 3)
        ds = AudioSpecDataset(filelist, data_hps())
        sampler = BucketSampler(ds.lengths, batch_size=2, boundaries=[32, 100, 300])
        sampler.set_epoch(1)
        loader = BucketedLoader(ds, sampler, num_workers=2, prefetch=2)

        def n_producers():
            return sum(t.name.startswith("Thread") and t.is_alive()
                       for t in threading.enumerate())

        base = n_producers()
        for _ in range(5):
            it = iter(loader)
            batch = next(it)
            assert batch.spec.shape[0] == 2
            del it, batch
            gc.collect()  # triggers GeneratorExit -> finally -> stop/join
        deadline = time.time() + 10
        while time.time() < deadline and n_producers() > base:
            time.sleep(0.1)
        assert n_producers() <= base, "producer threads leaked"
