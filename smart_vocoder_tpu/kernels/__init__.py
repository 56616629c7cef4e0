"""Pallas TPU kernels for the hot ops.

The reference's only "native" pieces are a torch.jit fused gate
(commons.py:100-107) and cuDNN convs (SURVEY.md section 2.7); the TPU-native
kernel surface is:

- :func:`fused_gate` -- the add-tanh-sigmoid gate as a Pallas kernel.
- :func:`fused_mrf_stage` -- an entire HiFi-GAN MRF stage (3 ResBlock1
  branches, 18 dilated convs + leaky-relus) fused in VMEM: one HBM read and
  one write per tile instead of ~20 tensor traversals. Targets the decoder's
  late stages (channels <= 128) where XLA's conv lowering is both
  lane-starved and bandwidth-bound.
"""

from smart_vocoder_tpu.kernels.gate import fused_gate
from smart_vocoder_tpu.kernels.mrf import (
    fused_mrf_stage,
    fused_mrf_stage_packed,
    fused_up_mrf_stage,
    mrf_stage_reference,
)

__all__ = [
    "fused_gate",
    "fused_mrf_stage",
    "fused_mrf_stage_packed",
    "fused_up_mrf_stage",
    "mrf_stage_reference",
]
