"""STFT / mel-spectrogram ops with reference-exact numerics (L1).

Reproduces the reference pipeline (mel_processing.py:51-112) in pure JAX:

  wav --reflect-pad (n_fft-hop)/2--> frames --hann--> rfft --> sqrt(|.|^2 + 1e-6)
      --mel basis matmul--> log(clamp(., 1e-5))

Differences from the torch implementation are layout-only: this framework is
time-major, so spectrograms are ``(batch, frames, bins)`` rather than the
reference's ``(batch, bins, frames)``.

Framing is done with the hop-chunk overlap trick (reshape into hop-sized
chunks, then concatenate ``n_fft // hop`` shifted views): all static shapes,
no gather -- XLA lowers it to cheap data movement on TPU. Falls back to a
gather when ``hop`` does not divide ``n_fft``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from smart_vocoder_tpu.ops.melscale import mel_filterbank


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """Static DSP hyper-parameters (from the config's ``data`` block)."""

    sampling_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float | None = None

    @classmethod
    def from_hparams(cls, hps) -> "MelConfig":
        return cls(
            sampling_rate=hps.data.sampling_rate,
            n_fft=hps.data.filter_length,
            hop_length=hps.data.hop_length,
            win_length=hps.data.win_length,
            n_mels=hps.data.n_mel_channels,
            fmin=hps.data.mel_fmin,
            fmax=hps.data.mel_fmax,
        )


@functools.lru_cache(maxsize=None)
def _hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window, matching ``torch.hann_window`` (mel_processing.py:61)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _mel_basis(sampling_rate: int, n_fft: int, n_mels: int, fmin: float, fmax) -> np.ndarray:
    return mel_filterbank(sampling_rate, n_fft, n_mels, fmin, fmax)


def _frame(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Slice ``y (B, L)`` into overlapping frames ``(B, n_frames, n_fft)``.

    ``n_frames = 1 + (L - n_fft) // hop`` -- torch.stft(center=False) count.
    """
    batch, length = y.shape
    n_frames = 1 + (length - n_fft) // hop
    if n_frames <= 0:
        raise ValueError(f"signal too short to frame: L={length}, n_fft={n_fft}")

    if n_fft % hop == 0:
        # Overlap factor r: frame t = concat(chunk[t], ..., chunk[t+r-1]).
        r = n_fft // hop
        n_chunks = length // hop
        chunks = y[:, : n_chunks * hop].reshape(batch, n_chunks, hop)
        views = [chunks[:, i : i + n_frames] for i in range(r)]
        return jnp.concatenate(views, axis=-1)

    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return y[:, idx]


def stft_magnitude(
    y: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    pad: bool = True,
) -> jnp.ndarray:
    """Linear magnitude STFT of ``y (B, L)`` -> ``(B, n_frames, n_fft//2+1)``.

    Matches ``spectrogram_torch`` (mel_processing.py:51-70): reflect-pad by
    ``(n_fft - hop)/2`` on both sides, Hann window, onesided un-normalized
    FFT, magnitude ``sqrt(re^2 + im^2 + 1e-6)``. With hop | L the frame count
    is exactly ``L // hop``.
    """
    if y.ndim != 2:
        raise ValueError(f"expected (batch, samples), got {y.shape}")
    orig_dtype = y.dtype
    y = y.astype(jnp.float32)

    if pad:
        p = int((n_fft - hop_length) / 2)
        y = jnp.pad(y, ((0, 0), (p, p)), mode="reflect")

    frames = _frame(y, n_fft, hop_length)
    window = jnp.asarray(_hann_window(win_length))
    if win_length < n_fft:  # torch centers the window inside the frame
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frames * window

    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-6)
    return mag.astype(orig_dtype)


def spectrogram(y: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Reference ``spectrogram_torch`` with config-bundled params."""
    return stft_magnitude(y, cfg.n_fft, cfg.hop_length, cfg.win_length)


def spec_to_mel(spec: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Linear spec ``(B, T, n_fft//2+1)`` -> log-mel ``(B, T, n_mels)``.

    Matches ``spec_to_mel_torch`` (mel_processing.py:73-82): slaney mel basis
    matmul then ``log(clamp(., min=1e-5))`` dynamic-range compression
    (mel_processing.py:19-25).
    """
    basis = jnp.asarray(
        _mel_basis(cfg.sampling_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    ).astype(spec.dtype)
    # (B, T, bins) @ (bins, n_mels); MXU-friendly contraction on the last axis.
    mel = jnp.einsum("btf,mf->btm", spec, basis)
    return jnp.log(jnp.clip(mel, min=1e-5))


def mel_spectrogram(y: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Fused wav ``(B, L)`` -> log-mel ``(B, L//hop, n_mels)``.

    Matches ``mel_spectrogram_torch`` (mel_processing.py:85-112); used on
    generated audio inside the mel loss (train.py:155-164).
    """
    return spec_to_mel(spectrogram(y, cfg), cfg)


def dynamic_range_compression(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    """log(clamp(x, clip_val)) (ref: mel_processing.py:19-25)."""
    return jnp.log(jnp.clip(x, min=clip_val))


def dynamic_range_decompression(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the log compression (ref: mel_processing.py:28-34)."""
    return jnp.exp(x)


def mel_basis_array(cfg: MelConfig) -> np.ndarray:
    """The (n_mels, n_fft//2+1) slaney basis as a host constant."""
    return _mel_basis(cfg.sampling_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
