"""DSP and tensor-utility ops (L1/L2).

Public surface mirrors the reference's mel_processing.py + commons.py:

- :func:`spectrogram`       -- linear-magnitude STFT   (ref: mel_processing.py:51-70)
- :func:`spec_to_mel`       -- spec -> log-mel          (ref: mel_processing.py:73-82)
- :func:`mel_spectrogram`   -- wav -> log-mel, fused    (ref: mel_processing.py:85-112)
- :func:`mel_filterbank`    -- slaney mel basis         (ref: librosa.filters.mel)
- :func:`sequence_mask`     -- length -> bool mask      (ref: commons.py:121-125)
- :func:`slice_segments` / :func:`rand_slice_segments`  (ref: commons.py:48-64)
"""

from smart_vocoder_tpu.ops.melscale import mel_filterbank
from smart_vocoder_tpu.ops.stft import (
    MelConfig,
    mel_spectrogram,
    spec_to_mel,
    spectrogram,
    stft_magnitude,
)
from smart_vocoder_tpu.ops.segments import (
    rand_slice_segments,
    sequence_mask,
    slice_segments,
)

__all__ = [
    "MelConfig",
    "mel_filterbank",
    "mel_spectrogram",
    "rand_slice_segments",
    "sequence_mask",
    "slice_segments",
    "spec_to_mel",
    "spectrogram",
    "stft_magnitude",
]
