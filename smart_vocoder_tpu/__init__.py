"""smart_vocoder_tpu — a TPU-native (JAX / XLA / Pallas / pjit) neural-vocoder framework.

A ground-up rebuild of the capabilities of SMART-TTS/SMART-Vocoder (a VITS-derived
conditional-VAE mel->waveform vocoder): mel-encoder prior, linear-spectrogram posterior
encoder, residual-coupling normalizing flow, HiFi-GAN decoder, multi-period/multi-scale
discriminators, GAN training with mel / KL / feature-matching losses and NDA jigsaw
negative augmentation.

Layer map (mirrors SURVEY.md section 1):
  config.py     -- L0 hparams / JSON config (reference: utils.py:144-258)
  ops/          -- L1 DSP (STFT, slaney mel filterbank) + L2 tensor utilities
  nn/           -- L3 building blocks (weight-normed convs, WN, ResBlocks, coupling)
  models/       -- L4 SynthesizerTrn + discriminators
  data/         -- L5 filelist dataset, bucket batching with static TPU shapes
  losses.py     -- L6 GAN / mel / KL / feature-matching losses
  training/     -- L7 jitted GAN train step, mesh data parallelism, loop
  inference.py  -- L9 Vocoder API (batched / chunked / streaming synthesis)
  serving.py    -- L9 StreamServer: N concurrent live streams, one batched decode
  utils/        -- L8 checkpointing (orbax + torch import), logging, plotting
  kernels/      -- Pallas TPU kernels for the hot paths
  parallel/     -- device mesh + sharding rules
"""

__version__ = "0.1.0"
