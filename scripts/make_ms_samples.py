#!/usr/bin/env python
"""Regenerate the multi-speaker sample set (reference generated_files_ms/,
README.md:47-48) from a trained ms checkpoint, in ONE process.

For each requested (wav, sid) pair: copy-synthesis through the serving path
(wav -> mel -> wav, hifi tail on -- the exact config bench.py times), plus a
copy-synthesis mel-L1 against the input so the sample set doubles as a
quality datapoint. Writes ``<out_dir>/<stem>_sid<k>.wav``.

Usage:
    python scripts/make_ms_samples.py <config> <ckpt: G_*.pth | model_dir> \
        <out_dir> <wav:sid> [<wav:sid> ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.io import wavfile


def main() -> None:
    config, ckpt, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    pairs = []
    for spec in sys.argv[4:]:
        path, sid = spec.rsplit(":", 1)
        pairs.append((path, int(sid)))

    from smart_vocoder_tpu.inference import Vocoder

    if os.path.isdir(ckpt):
        voc = Vocoder.from_orbax_checkpoint(config, ckpt)
    else:
        voc = Vocoder.from_torch_checkpoint(config, ckpt)
    os.makedirs(out_dir, exist_ok=True)

    import jax.numpy as jnp

    from smart_vocoder_tpu.ops import MelConfig, mel_spectrogram

    mel_cfg = MelConfig.from_hparams(voc.hps)
    sr = voc.hps.data.sampling_rate
    hop = voc.hps.data.hop_length
    for path, sid in pairs:
        in_sr, data = wavfile.read(path)
        assert in_sr == sr, (path, in_sr, sr)
        wav = data.astype(np.float32) / voc.hps.data.max_wav_value
        t0 = time.time()
        out = voc.wav_to_wav(wav, sid=np.asarray([sid]))
        dt = time.time() - t0
        # copy-synthesis mel-L1: the fidelity metric of BASELINE.json, here
        # against the INPUT's mel (trained-model quality, not impl parity)
        usable = (len(wav) // hop) * hop
        mel_in = mel_spectrogram(jnp.asarray(wav[None, :usable]), mel_cfg)
        mel_out = mel_spectrogram(jnp.asarray(out[None, :usable]), mel_cfg)
        l1 = float(jnp.mean(jnp.abs(mel_in - mel_out)))
        stem = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(out_dir, f"{stem}_sid{sid}.wav")
        wavfile.write(out_path, sr,
                      (np.clip(out, -1, 1) * 32767).astype(np.int16))
        print(f"{out_path}: {len(out)/sr:.2f}s in {dt:.2f}s "
              f"({len(out)/sr/dt:.0f}x RT), copy-synth mel_l1 {l1:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
