#!/usr/bin/env python
"""Batch mel->wav inference CLI (the script form of inference.ipynb).

    python infer.py -c configs/iitp_base.json --ckpt <G_*.pth | model_dir> \
        --wavs 'test_wav_dir/*.wav' --out_dir generated_files

Each input wav is copy-synthesized (wav -> mel -> wav, notebook cell 4) and
written to out_dir; prints per-file and aggregate real-time factors.
"""

import argparse
import glob
import os
import time

import numpy as np
from scipy.io import wavfile

from smart_vocoder_tpu.inference import Vocoder


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--ckpt", required=True,
                   help="reference G_*.pth file or a model_dir with orbax checkpoints")
    p.add_argument("--wavs", required=True, help="glob of input wavs")
    p.add_argument("--out_dir", default="generated_files")
    p.add_argument("--noise_scale", type=float, default=0.667)
    p.add_argument("--sid", type=int, default=None, help="speaker id (ms configs)")
    args = p.parse_args()

    if os.path.isdir(args.ckpt):
        voc = Vocoder.from_orbax_checkpoint(args.config, args.ckpt)
    else:
        voc = Vocoder.from_torch_checkpoint(args.config, args.ckpt)

    os.makedirs(args.out_dir, exist_ok=True)
    sr = voc.hps.data.sampling_rate
    files = sorted(glob.glob(args.wavs))
    total_audio = total_time = 0.0
    for path in files:
        in_sr, data = wavfile.read(path)
        assert in_sr == sr, f"{path}: {in_sr} != {sr}"
        wav = data.astype(np.float32) / voc.hps.data.max_wav_value

        t0 = time.time()
        sid = None if args.sid is None else np.asarray([args.sid])
        out = voc.wav_to_wav(wav, noise_scale=args.noise_scale, sid=sid)
        dt = time.time() - t0

        out_path = os.path.join(args.out_dir, os.path.basename(path))
        wavfile.write(out_path, sr, (np.clip(out, -1, 1) * 32767).astype(np.int16))
        rtf = (len(out) / sr) / dt
        total_audio += len(out) / sr
        total_time += dt
        print(f"{out_path}: {len(out)/sr:.2f}s audio in {dt:.3f}s ({rtf:.1f}x RT)")

    if files:
        print(f"TOTAL: {total_audio:.1f}s audio in {total_time:.2f}s "
              f"({total_audio/total_time:.1f}x RT)")


if __name__ == "__main__":
    main()
