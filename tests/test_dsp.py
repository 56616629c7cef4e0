"""Golden tests for the DSP layer vs torch (reference numerics).

The BASELINE fidelity target (mel-L1 <= 1e-2 vs the PyTorch reference) hinges
on the STFT/mel path matching mel_processing.py:51-112 exactly; these tests
pin that down at much tighter tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from smart_vocoder_tpu.ops import (
    MelConfig,
    mel_filterbank,
    mel_spectrogram,
    sequence_mask,
    slice_segments,
    rand_slice_segments,
    spec_to_mel,
    spectrogram,
    stft_magnitude,
)

CFG = MelConfig()  # 22.05 kHz / 1024 fft / 256 hop / 80 mels, iitp_base.json values


def _torch_spectrogram(y: np.ndarray, n_fft=1024, hop=256, win=1024) -> np.ndarray:
    """The reference spectrogram_torch math (mel_processing.py:51-70), inline."""
    yt = torch.from_numpy(y).float()
    window = torch.hann_window(win)
    pad = int((n_fft - hop) / 2)
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        yt, n_fft, hop_length=hop, win_length=win, window=window,
        center=False, pad_mode="reflect", normalized=False, onesided=True,
        return_complex=True,
    )
    spec = torch.view_as_real(spec)
    return torch.sqrt(spec.pow(2).sum(-1) + 1e-6).numpy()  # (B, bins, frames)


class TestSTFT:
    def test_matches_torch_stft(self):
        rng = np.random.default_rng(0)
        y = rng.uniform(-1, 1, size=(3, 8192)).astype(np.float32)
        ours = np.asarray(stft_magnitude(jnp.asarray(y), 1024, 256, 1024))
        ref = _torch_spectrogram(y).transpose(0, 2, 1)  # -> (B, frames, bins)
        assert ours.shape == ref.shape == (3, 32, 513)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)

    def test_non_divisible_length(self):
        rng = np.random.default_rng(1)
        y = rng.uniform(-1, 1, size=(1, 5000)).astype(np.float32)
        ours = np.asarray(stft_magnitude(jnp.asarray(y), 1024, 256, 1024))
        ref = _torch_spectrogram(y).transpose(0, 2, 1)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)

    def test_frame_count_is_length_over_hop(self):
        y = jnp.zeros((1, 256 * 100))
        assert spectrogram(y, CFG).shape == (1, 100, 513)

    def test_jit_and_grad(self):
        y = jnp.sin(jnp.linspace(0, 100, 4096))[None, :]
        f = jax.jit(lambda w: jnp.sum(mel_spectrogram(w, CFG)))
        g = jax.grad(f)(y)
        assert g.shape == y.shape
        assert bool(jnp.all(jnp.isfinite(g)))


class TestMelFilterbank:
    def test_shape_and_nonneg(self):
        fb = mel_filterbank(22050, 1024, 80, 0.0, None)
        assert fb.shape == (80, 513)
        assert (fb >= 0).all()
        # every mel band touches at least one fft bin
        assert (fb.sum(axis=1) > 0).all()

    def test_slaney_area_normalization(self):
        # With slaney norm each triangle has peak ~ 2/bandwidth; integrating
        # over Hz gives ~1 for bands wide enough to be well-sampled.
        fb = mel_filterbank(22050, 1024, 80, 0.0, None).astype(np.float64)
        df = 22050 / 2.0 / 512.0
        areas = fb.sum(axis=1) * df
        assert np.all(np.abs(areas[10:] - 1.0) < 0.15)

    def test_band_edges_monotonic(self):
        fb = mel_filterbank(22050, 1024, 80, 0.0, None)
        peaks = fb.argmax(axis=1)
        assert (np.diff(peaks) >= 0).all()

    def test_fmax_none_is_nyquist(self):
        a = mel_filterbank(22050, 1024, 80, 0.0, None)
        b = mel_filterbank(22050, 1024, 80, 0.0, 11025.0)
        np.testing.assert_array_equal(a, b)

    def test_matches_torch_matmul_path(self):
        """spec_to_mel == reference's basis-matmul + log-clamp, given same basis."""
        rng = np.random.default_rng(2)
        spec = rng.uniform(0, 4, size=(2, 17, 513)).astype(np.float32)
        fb = mel_filterbank(22050, 1024, 80, 0.0, None)
        ref = torch.log(
            torch.clamp(torch.from_numpy(fb) @ torch.from_numpy(spec.transpose(0, 2, 1)[0]), min=1e-5)
        ).numpy()
        ours = np.asarray(spec_to_mel(jnp.asarray(spec), CFG))
        # fp32 matmul accumulation order differs between XLA and torch; the
        # residual (<5e-3 in log space) is far inside the 1e-2 mel-L1 budget.
        np.testing.assert_allclose(ours[0].T, ref, rtol=2e-3, atol=6e-3)


class TestSegments:
    def test_sequence_mask(self):
        m = sequence_mask(jnp.array([2, 5]), 5)
        assert m.shape == (2, 5, 1)
        np.testing.assert_array_equal(
            np.asarray(m[..., 0]),
            [[1, 1, 0, 0, 0], [1, 1, 1, 1, 1]],
        )

    def test_slice_segments(self):
        x = jnp.arange(2 * 10 * 3).reshape(2, 10, 3)
        out = slice_segments(x, jnp.array([0, 4]), 4)
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(x[0, 0:4]))
        np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(x[1, 4:8]))

    def test_rand_slice_in_bounds(self):
        x = jnp.ones((4, 100, 2))
        lengths = jnp.array([40, 100, 33, 64])
        for seed in range(5):
            seg, ids = rand_slice_segments(jax.random.key(seed), x, lengths, 32)
            assert seg.shape == (4, 32, 2)
            assert bool(jnp.all(ids >= 0))
            assert bool(jnp.all(ids + 32 <= lengths))

    def test_mel_of_sliced_wav_matches_sliced_mel_frames(self):
        """Decoded-slice mel loss alignment: slicing z at frame f corresponds to
        wav samples [f*hop, f*hop + segment) (train.py:154-166)."""
        rng = np.random.default_rng(3)
        y = rng.uniform(-1, 1, size=(1, 256 * 64)).astype(np.float32)
        full = mel_spectrogram(jnp.asarray(y), CFG)
        f0 = 7
        ywin = jnp.asarray(y[:, f0 * 256 : f0 * 256 + 8192])
        win_mel = mel_spectrogram(ywin, CFG)
        # Interior frames match; edge frames differ by the reflect padding.
        np.testing.assert_allclose(
            np.asarray(win_mel[:, 2:-2]), np.asarray(full[:, f0 + 2 : f0 + 30]),
            rtol=1e-4, atol=1e-3,
        )
