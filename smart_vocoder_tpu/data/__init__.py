"""Data pipeline (L5): filelist dataset, bucketed batching with static shapes."""

from smart_vocoder_tpu.data.dataset import AudioSpecDataset, load_filepaths, load_wav
from smart_vocoder_tpu.data.sampler import BucketSampler
from smart_vocoder_tpu.data.pipeline import BucketedLoader, pad_to_bucket

__all__ = [
    "AudioSpecDataset",
    "BucketSampler",
    "BucketedLoader",
    "load_filepaths",
    "load_wav",
    "pad_to_bucket",
]
