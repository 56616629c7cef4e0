"""End-to-end smoke test: the full train loop (loop.py) on synthetic data --
config -> dataset -> bucketed loader -> pjit step -> TB logs -> orbax
checkpoint -> resume. Tiny model, few steps, CPU mesh."""

import json
import os

import numpy as np
import pytest
from scipy.io import wavfile

from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.training.loop import run

SR = 22050
HOP = 256


def make_dataset(tmp_path, n=6, frames=48, n_speakers=0):
    wav_dir = os.path.join(str(tmp_path), "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    for i in range(n):
        f = frames + 4 * i
        t = np.arange(f * HOP) / SR
        wav = (np.sin(2 * np.pi * (200 + 50 * i) * t) * 9000).astype(np.int16)
        wavfile.write(os.path.join(wav_dir, f"u{i}.wav"), SR, wav)
    filelist = os.path.join(str(tmp_path), "train.txt")
    with open(filelist, "w") as f:
        for i in range(n):
            path = os.path.join(wav_dir, f"u{i}.wav")
            if n_speakers:
                f.write(f"{path}|{i % n_speakers}\n")  # multi-speaker filelist
            else:
                f.write(path + "\n")
    return filelist


def make_config(tmp_path, filelist):
    cfg = {
        "train": {
            "log_interval": 1, "eval_interval": 2, "seed": 1234, "epochs": 2,
            "learning_rate": 2e-4, "betas": [0.8, 0.99], "eps": 1e-9,
            "batch_size": 2, "fp16_run": False, "lr_decay": 0.999875,
            "segment_size": 2048, "c_mel": 45, "c_kl": 1.0,
        },
        "data": {
            "training_files": filelist, "validation_files": filelist,
            "max_wav_value": 32768.0, "sampling_rate": SR, "filter_length": 1024,
            "hop_length": HOP, "win_length": 1024, "n_mel_channels": 80,
            "mel_fmin": 0.0, "mel_fmax": None, "add_blank": True, "n_speakers": 3,
        },
        "model": {
            "inter_channels": 32, "hidden_channels": 32, "filter_channels": 64,
            "n_heads": 2, "n_layers": 2, "kernel_size": 3, "p_dropout": 0.1,
            "resblock": "2", "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 3]], "upsample_rates": [8, 8, 2, 2],
            "upsample_initial_channel": 32, "upsample_kernel_sizes": [16, 16, 4, 4],
            "use_spectral_norm": False, "gin_channels": 8, "use_spk_embed": True,
            "enc_layers": 2, "flow_wn_layers": 2, "disc_width_mult": 0.125,
        },
        "tpu": {
            "bf16_run": False, "bucket_boundaries": [32, 64, 128],
            "data_parallel": 2, "model_parallel": 1, "keep_ckpts": 2,
        },
    }
    path = os.path.join(str(tmp_path), "config.json")
    with open(path, "w") as f:
        json.dump(cfg, f)
    return path


@pytest.mark.slow
def test_train_loop_end_to_end(tmp_path):
    """Multi-speaker DP training end-to-end (BASELINE config #5): speaker-id
    filelists -> bucketed loader -> speaker-conditioned pjit GAN step."""
    filelist = make_dataset(tmp_path, n_speakers=3)
    cfg_path = make_config(tmp_path, filelist)
    hps = load_config(cfg_path)
    hps.model_dir = os.path.join(str(tmp_path), "run")
    os.makedirs(hps.model_dir, exist_ok=True)

    run(hps, max_steps=3)

    # train log exists and mentions training
    log_path = os.path.join(hps.model_dir, "train.log")
    assert os.path.exists(log_path)
    assert "Train Epoch" in open(log_path).read()

    # TB event files written (train + eval)
    event_files = [f for f in os.listdir(hps.model_dir) if f.startswith("events")]
    assert event_files
    assert os.path.isdir(os.path.join(hps.model_dir, "eval"))
    # training-loop mel images logged under the reference TB names
    # (train.py:230-239); tags are embedded verbatim in the event protobufs
    blob = b"".join(
        open(os.path.join(hps.model_dir, f), "rb").read() for f in event_files
    )
    for tag in (b"slice/mel_org", b"slice/mel_gen", b"all/mel"):
        assert tag in blob, tag

    # orbax checkpoint exists
    ckpt_dir = os.path.join(hps.model_dir, "checkpoints")
    steps = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    assert steps, os.listdir(ckpt_dir)

    # resume: run a few more steps from the checkpoint
    run(hps, max_steps=5)
    log = open(log_path).read()
    assert "resumed from step" in log


@pytest.mark.slow
def test_train_loop_non_chief_process(tmp_path, monkeypatch):
    """Multi-host branches of the loop at process_index=1 (loop.py:61,
    75-80, 185-192): the non-chief process must build a rank-sharded
    sampler, skip all logging/eval, and still participate in every
    checkpoint save (chief-only saves would deadlock a real multi-host
    sharded save). Real multi-host orbax needs jax.distributed, so the
    manager is stubbed to observe the save discipline."""
    import jax

    from smart_vocoder_tpu.utils import checkpoint as ckpt_mod

    filelist = make_dataset(tmp_path, n_speakers=3)
    cfg_path = make_config(tmp_path, filelist)
    hps = load_config(cfg_path)
    hps.model_dir = os.path.join(str(tmp_path), "run_mh")
    os.makedirs(hps.model_dir, exist_ok=True)

    saves = []

    class StubManager:
        def __init__(self, *a, **k):
            pass

        def save(self, step, state, epoch):
            saves.append(int(step))

        def wait(self):
            pass

    monkeypatch.setattr(ckpt_mod, "CheckpointManager", StubManager)
    monkeypatch.setattr(ckpt_mod, "try_resume",
                        lambda mngr, state: (state, 1, False))
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)

    run(hps, max_steps=3)

    # non-chief: no train.log, no TB event files, no eval writer
    assert not os.path.exists(os.path.join(hps.model_dir, "train.log"))
    assert not [f for f in os.listdir(hps.model_dir) if f.startswith("events")]
    assert not os.path.isdir(os.path.join(hps.model_dir, "eval"))
    # but it participated in the sharded saves (eval_interval=2 + final step)
    assert saves, "non-chief process skipped checkpoint saves"
