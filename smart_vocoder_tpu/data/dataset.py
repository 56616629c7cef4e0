"""Filelist-driven audio dataset (reference data_utils.py:14-80).

Feature extraction happens at load time on the host, exactly like the
reference: read 16-bit wav (scipy), normalize by max_wav_value, compute the
linear magnitude spectrogram (numpy mirror of ops/stft.py so loader workers
never touch the accelerator). Utterance lengths for bucketing are estimated
from *file size* without reading audio (data_utils.py:34-46).

Filelist format: one wav path per line; optionally ``path|speaker_id`` for
speaker-conditioned training (the reference's ``get_sid`` hook exists but is
unused, data_utils.py:72-74 -- here it is functional). Lines containing glob
characters are expanded (the shipped reference filelists contain glob
patterns, filelists/train_files_ss.txt:1).
"""

from __future__ import annotations

import glob as globlib
import os
import random
from typing import List, Optional, Tuple

import numpy as np
from scipy.io import wavfile

from smart_vocoder_tpu.ops.melscale import mel_filterbank  # noqa: F401  (re-export convenience)
from smart_vocoder_tpu.ops.stft import _hann_window


def load_filepaths(filename: str) -> List[Tuple[str, Optional[int]]]:
    """Read a filelist; expand glob lines; parse optional ``|sid`` suffixes."""
    entries: List[Tuple[str, Optional[int]]] = []
    with open(filename, encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if not line:
                continue
            sid: Optional[int] = None
            if "|" in line:
                path, sid_str = line.split("|", 1)
                sid = int(sid_str)
            else:
                path = line
            if any(ch in path for ch in "*?["):
                entries.extend((p, sid) for p in sorted(globlib.glob(path, recursive=True)))
            else:
                entries.append((path, sid))
    return entries


def load_wav(full_path: str) -> Tuple[np.ndarray, int]:
    """Read a wav as float32 raw values + its sample rate (ref: utils.py:133-135)."""
    sampling_rate, data = wavfile.read(full_path)
    return data.astype(np.float32), sampling_rate


def stft_magnitude_np(y: np.ndarray, n_fft: int, hop: int, win: int) -> np.ndarray:
    """Host-side numpy mirror of ops.stft.stft_magnitude for loader workers.

    y: (L,) float32 -> (n_frames, n_fft//2+1) float32.
    """
    p = int((n_fft - hop) / 2)
    y = np.pad(y, (p, p), mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = y[idx] * _hann_window(win)
    spec = np.fft.rfft(frames, n=n_fft, axis=-1)
    return np.sqrt(spec.real**2 + spec.imag**2 + 1e-6).astype(np.float32)


def _wav_data_frames(path: str) -> Optional[int]:
    """Sample-frame count from a RIFF/WAVE header: data_size // block_align.

    Walks the chunk list (handles LIST/fact/etc. before 'data'). Returns None
    for anything that is not a well-formed wav -- callers fall back to a
    file-size estimate.
    """
    import struct

    try:
        with open(path, "rb") as f:
            riff = f.read(12)
            if len(riff) < 12 or riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
                return None
            block_align = None
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    return None
                cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
                if cid == b"fmt ":
                    fmt = f.read(size)
                    if len(fmt) < 16:
                        return None
                    block_align = struct.unpack("<H", fmt[12:14])[0]
                elif cid == b"data":
                    if not block_align:
                        return None
                    return size // block_align
                else:
                    f.seek(size + (size & 1), os.SEEK_CUR)
    except OSError:
        return None


class AudioSpecDataset:
    """(spec, wav, sid) tuples from a filelist (ref: data_utils.py:14-80).

    ``cache_specs=True`` memoizes computed spectrograms as ``<wav>.spec.npy``
    next to the audio (the reference has this path commented out,
    data_utils.py:61-68); loads skip the STFT when a fresh cache exists.
    """

    def __init__(self, filelist: str, hps_data, cache_specs: bool = False):
        self.entries = load_filepaths(filelist)
        self.max_wav_value = hps_data.max_wav_value
        self.sampling_rate = hps_data.sampling_rate
        self.filter_length = hps_data.filter_length
        self.hop_length = hps_data.hop_length
        self.win_length = hps_data.win_length
        self.cache_specs = cache_specs

        # Reference shuffles once with a fixed seed before filtering
        # (data_utils.py:30-31).
        rng = random.Random(1234)
        rng.shuffle(self.entries)
        self._estimate_lengths()

    def _estimate_lengths(self) -> None:
        """Spec length for bucketing, from the wav header when parseable.

        The reference estimates ``file_size // (2 * hop)`` (data_utils.py:34-46)
        -- correct only for mono PCM16. Float32/24-bit/stereo wavs would be
        under-estimated (up to ~4x), land in too-small buckets, and get
        silently cropped by the collate. Reading ``data_size / block_align``
        from the RIFF header is exact for every wav the loader accepts and
        costs one small read per file at init.
        """
        self.lengths = []
        for path, _ in self.entries:
            frames = _wav_data_frames(path)
            if frames is None:  # unparseable header: reference fallback
                frames = os.path.getsize(path) // 2
            self.lengths.append(frames // self.hop_length)

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, index: int):
        from smart_vocoder_tpu.data import native_wavio

        path, sid = self.entries[index]
        native = native_wavio.read_wav_norm_f32(path, self.max_wav_value)
        if native is not None:
            audio_norm, sr = native  # C++ fast path (mono PCM16, GIL released)
        else:
            audio, sr = load_wav(path)
            audio_norm = audio / self.max_wav_value
        if sr != self.sampling_rate:
            raise ValueError(
                f"{sr} SR doesn't match target {self.sampling_rate} SR ({path})"
            )
        # Trim to a hop multiple so spec frames * hop == wav samples exactly
        # (keeps the static-shape invariant wav_len == spec_len * hop).
        usable = (len(audio_norm) // self.hop_length) * self.hop_length
        audio_norm = audio_norm[:usable]

        spec = None
        cache_path = path + ".spec.npy"
        if self.cache_specs and os.path.exists(cache_path) and (
            os.path.getmtime(cache_path) >= os.path.getmtime(path)
        ):
            spec = np.load(cache_path)
            if spec.shape[0] != usable // self.hop_length:
                spec = None  # stale / different DSP params
        if spec is None:
            spec = stft_magnitude_np(
                audio_norm, self.filter_length, self.hop_length, self.win_length
            )
            if self.cache_specs:
                np.save(cache_path, spec)
        return spec, audio_norm[:, None], sid
