"""Native C++ wav reader vs scipy oracle."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from smart_vocoder_tpu.data import native_wavio

SR = 22050


@pytest.fixture(scope="module")
def native_ok():
    if not native_wavio.available():
        pytest.skip("native wavio not built (no compiler?)")
    return True


class TestNativeWavio:
    def test_matches_scipy(self, tmp_path, native_ok):
        rng = np.random.default_rng(0)
        data = (rng.uniform(-0.8, 0.8, SR * 2) * 32767).astype(np.int16)
        path = os.path.join(str(tmp_path), "a.wav")
        wavfile.write(path, SR, data)

        out = native_wavio.read_wav_norm_f32(path, 32768.0)
        assert out is not None
        audio, sr = out
        assert sr == SR
        want = data.astype(np.float32) / 32768.0
        np.testing.assert_array_equal(audio, want)

    def test_rejects_stereo(self, tmp_path, native_ok):
        data = np.zeros((100, 2), np.int16)
        path = os.path.join(str(tmp_path), "st.wav")
        wavfile.write(path, SR, data)
        assert native_wavio.read_wav_norm_f32(path) is None  # scipy fallback path

    def test_rejects_garbage(self, tmp_path, native_ok):
        path = os.path.join(str(tmp_path), "bad.wav")
        with open(path, "wb") as f:
            f.write(b"not a wav file at all")
        assert native_wavio.read_wav_norm_f32(path) is None

    def test_dataset_uses_native(self, tmp_path, native_ok):
        from smart_vocoder_tpu.config import HParams
        from smart_vocoder_tpu.data import AudioSpecDataset

        data = (np.sin(np.arange(SR) / 30) * 12000).astype(np.int16)
        path = os.path.join(str(tmp_path), "u.wav")
        wavfile.write(path, SR, data)
        filelist = os.path.join(str(tmp_path), "f.txt")
        with open(filelist, "w") as f:
            f.write(path + "\n")
        hps = HParams(max_wav_value=32768.0, sampling_rate=SR, filter_length=1024,
                      hop_length=256, win_length=1024)
        ds = AudioSpecDataset(filelist, hps)
        spec, wav, _ = ds[0]
        assert abs(float(wav.max()) - 12000 / 32768.0) < 1e-3
