"""Hyper-parameter / config system (L0).

Keeps the reference's JSON schema verbatim so `configs/iitp_base.json` and
`configs/iitp_base_ms.json` drive this framework unmodified (reference:
utils.py:144-258, configs/iitp_base.json). A config has three blocks --
``train``, ``data``, ``model`` -- plus optional TPU-specific extras under
``tpu`` that all have defaults (so reference configs need no edits).

`HParams` is a recursive attribute/dict hybrid like the reference's
(utils.py:229-258); on top of that we validate and default-fill the keys the
TPU runtime needs.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, Iterator


class HParams:
    """Recursive dict -> attribute config object (reference: utils.py:229-258)."""

    def __init__(self, **kwargs: Any) -> None:
        for k, v in kwargs.items():
            if isinstance(v, dict):
                v = HParams(**v)
            self[k] = v

    # -- dict protocol -------------------------------------------------------
    def keys(self):
        return self.__dict__.keys()

    def items(self):
        return self.__dict__.items()

    def values(self):
        return self.__dict__.values()

    def get(self, key: str, default: Any = None) -> Any:
        return self.__dict__.get(key, default)

    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in self.__dict__.items():
            out[k] = v.to_dict() if isinstance(v, HParams) else v
        return out

    def __len__(self) -> int:
        return len(self.__dict__)

    def __getitem__(self, key: str) -> Any:
        return getattr(self, key)

    def __setitem__(self, key: str, value: Any) -> None:
        setattr(self, key, value)

    def __contains__(self, key: str) -> bool:
        return key in self.__dict__

    def __iter__(self) -> Iterator[str]:
        return iter(self.__dict__)

    def __repr__(self) -> str:
        return repr(self.__dict__)


# Default TPU-runtime extras. Everything here may be overridden by a "tpu"
# block in the JSON config; reference configs (which have no such block) get
# these values.
_TPU_DEFAULTS: Dict[str, Any] = {
    # Use bfloat16 for model compute (the TPU analogue of the reference's
    # fp16_run AMP path, train.py:141/112). Losses stay float32 either way.
    "bf16_run": None,  # None -> inherit train.fp16_run
    # Bucket upper boundaries, in spectrogram frames. Each batch is padded to
    # the smallest boundary >= its longest sample so XLA sees a bounded set of
    # static shapes. Mirrors the reference sampler boundaries (train.py:69).
    "bucket_boundaries": [32, 300, 400, 500, 600, 700, 800, 900, 1000],
    # Data-parallel mesh axis size; -1 = all addressable devices.
    "data_parallel": -1,
    # Tensor-parallel (channel-sharded) mesh axis size.
    "model_parallel": 1,
    # Enable Pallas TPU kernels for hot ops where available.
    "use_pallas": False,
    # Route serving enc_p/flow WN stacks through the fused Pallas kernel
    # (kernels/encoder.py). Off by default: measured slower than XLA's convs
    # on v5e (see Vocoder.__init__ / scripts/bench_wn_path.py).
    "use_pallas_wn": False,
    # Checkpoints to retain.
    "keep_ckpts": 5,
    # Trace `profile_steps` training steps starting at `profile_start_step`
    # with jax.profiler into <model_dir>/profile (0 = off).
    "profile_steps": 0,
    "profile_start_step": 10,
    # Fail fast on NaN/Inf anywhere in the jitted step (jax_debug_nans).
    "debug_nans": False,
    # Persistent XLA compilation cache (utils/compile_cache.py): replay
    # compiled executables across processes so resume-after-preemption and
    # repeated CLI runs skip the multi-minute train-step compile. true ->
    # ~/.cache/smart_vocoder_tpu/xla, a string -> that directory, false -> off;
    # SMART_VOCODER_XLA_CACHE env var overrides.
    "compilation_cache": True,
    # Memoize computed spectrograms as <wav>.spec.npy next to the audio
    # (the reference's commented-out .spec.pt cache, data_utils.py:61-68).
    # Off by default to match the reference's effective behavior; turn on
    # for many-epoch runs on small corpora to skip the per-epoch STFT.
    "cache_specs": False,
}

_REQUIRED_TRAIN = ["learning_rate", "betas", "eps", "batch_size", "segment_size", "c_mel", "c_kl", "lr_decay", "seed"]
_REQUIRED_DATA = ["sampling_rate", "filter_length", "hop_length", "win_length", "n_mel_channels", "mel_fmin", "max_wav_value"]


def _fill_defaults(hps: HParams) -> HParams:
    tpu = hps.get("tpu")
    if tpu is None:
        tpu = HParams()
        hps["tpu"] = tpu
    for k, v in _TPU_DEFAULTS.items():
        if k not in tpu:
            tpu[k] = v
    if tpu.bf16_run is None:
        tpu.bf16_run = bool(hps.train.get("fp16_run", False))
    # mel_fmax: JSON null -> None (librosa semantics: sr/2); keep as-is.
    if "mel_fmax" not in hps.data:
        hps.data["mel_fmax"] = None
    if "n_speakers" not in hps.data:
        hps.data["n_speakers"] = 0
    return hps


def validate(hps: HParams) -> HParams:
    for key in _REQUIRED_TRAIN:
        if key not in hps.train:
            raise ValueError(f"config.train missing required key: {key}")
    for key in _REQUIRED_DATA:
        if key not in hps.data:
            raise ValueError(f"config.data missing required key: {key}")
    if hps.train.segment_size % hps.data.hop_length != 0:
        raise ValueError("train.segment_size must be a multiple of data.hop_length")
    return _fill_defaults(hps)


def load_config(config_path: str) -> HParams:
    """Load + validate a JSON config file (reference: utils.py:185-191)."""
    with open(config_path, "r", encoding="utf-8") as f:
        config = json.load(f)
    return validate(HParams(**config))


# Back-compat aliases mirroring the reference API surface (utils.py:185, :174).
def get_hparams_from_file(config_path: str) -> HParams:
    return load_config(config_path)


def get_hparams_from_dir(model_dir: str) -> HParams:
    hps = load_config(os.path.join(model_dir, "config.json"))
    hps.model_dir = model_dir
    return hps


def get_hparams(args=None, init: bool = True) -> HParams:
    """CLI entry: ``-c/--config`` + ``-m/--model`` -> HParams with `.model_dir`.

    Creates ``./logs/<model>/`` and snapshots the config there for
    reproducibility, exactly like the reference (utils.py:144-171).
    """
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, default="./configs/iitp_base.json",
                        help="JSON file for configuration")
    parser.add_argument("-m", "--model", type=str, required=True, help="Model name")
    ns, _ = parser.parse_known_args(args)

    model_dir = os.path.join("./logs", ns.model)
    os.makedirs(model_dir, exist_ok=True)

    config_save_path = os.path.join(model_dir, "config.json")
    if init:
        with open(ns.config, "r", encoding="utf-8") as f:
            data = f.read()
        with open(config_save_path, "w", encoding="utf-8") as f:
            f.write(data)
    else:
        with open(config_save_path, "r", encoding="utf-8") as f:
            data = f.read()

    hps = validate(HParams(**json.loads(data)))
    hps.model_dir = model_dir
    return hps
