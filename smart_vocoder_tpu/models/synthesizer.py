"""SynthesizerTrn: the conditional-VAE vocoder generator (reference models.py).

Training path (models.py:317-329): posterior encoder samples ``z`` from the
linear spectrogram; the flow maps ``z -> z_p``; the mel encoder produces the
prior ``N(m_p, exp(logs_p))``; a random 32-frame slice of ``z`` is decoded by
the HiFi-GAN generator into an 8192-sample waveform chunk.

Inference path (models.py:331-339): sample ``z_p`` from the mel prior scaled
by ``noise_scale``, run the flow in reverse, decode full length.

Everything is time-major ``(B, T, C)``; waveforms are ``(B, samples, 1)``.

Speaker conditioning: the reference plumbs ``gin_channels=256`` into every WN
stack but hard-forces ``g=None`` and never defines ``emb_g``, so its
``voice_conversion`` crashes as shipped (models.py:318, :332, :343 -- SURVEY
section 2.1). Here a real ``emb_g`` exists behind ``use_spk_embed`` (default
False == reference behaviour; set ``"use_spk_embed": true`` in the config's
model block for actually speaker-conditioned multi-speaker training).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from smart_vocoder_tpu.nn import (
    LRELU_SLOPE,
    NormConv1d,
    NormConvTranspose1d,
    ResBlock1,
    ResBlock2,
    ResidualCouplingLayer,
    WN,
    flip_channels,
)
from smart_vocoder_tpu.ops import rand_slice_segments, sequence_mask


class MelEncoder(nn.Module):
    """Prior network: 80-bin mel -> (m_p, logs_p) (ref: models.py:15-47).

    The reference forces g=None internally (models.py:36), i.e. the prior is
    never speaker-conditioned; kept identical.
    """

    out_channels: int
    hidden_channels: int
    n_layers: int = 16
    kernel_size: int = 5
    dilation_rate: int = 1
    gin_channels: int = 0
    n_mels: int = 80  # input channel count hardcoded in the reference (models.py:32)
    dtype: jnp.dtype = jnp.float32
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_lengths: jnp.ndarray):
        x = NormConv1d(self.hidden_channels, 1, dtype=self.dtype, name="pre_enc")(x)
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(x.dtype)
        x = WN(
            self.hidden_channels, self.kernel_size, self.dilation_rate, self.n_layers,
            gin_channels=self.gin_channels, dtype=self.dtype,
            weight_norm=self.weight_norm, name="encoder",
        )(x * x_mask, x_mask, g=None)
        stats = NormConv1d(self.out_channels * 2, 1, dtype=self.dtype, name="proj")(x) * x_mask
        m, logs = stats[..., : self.out_channels], stats[..., self.out_channels :]
        return x, m, logs, x_mask


class PosteriorEncoder(nn.Module):
    """Linear-spec -> reparameterized latent sample (ref: models.py:83-112)."""

    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 0
    dtype: jnp.dtype = jnp.float32
    weight_norm: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_lengths: jnp.ndarray,
        rng: jax.Array,
        g: jnp.ndarray | None = None,
    ):
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(x.dtype)
        x = NormConv1d(self.hidden_channels, 1, dtype=self.dtype, name="pre")(x) * x_mask
        x = WN(
            self.hidden_channels, self.kernel_size, self.dilation_rate, self.n_layers,
            gin_channels=self.gin_channels, dtype=self.dtype,
            weight_norm=self.weight_norm, name="enc",
        )(x, x_mask, g=g)
        stats = NormConv1d(self.out_channels * 2, 1, dtype=self.dtype, name="proj")(x) * x_mask
        m, logs = stats[..., : self.out_channels], stats[..., self.out_channels :]
        eps = jax.random.normal(rng, m.shape, dtype=jnp.float32).astype(m.dtype)
        z = (m + eps * jnp.exp(logs)) * x_mask
        return z, m, logs, x_mask


class ResidualCouplingBlock(nn.Module):
    """4x (coupling + flip) normalizing flow (ref: models.py:50-80).

    Couplings are named ``flows_0/2/4/6`` to mirror the torch ModuleList
    indices (flips at odd indices hold no params).
    """

    channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 8
    n_flows: int = 4
    gin_channels: int = 0
    dtype: jnp.dtype = jnp.float32
    weight_norm: bool = True

    def setup(self):
        self.couplings = [
            ResidualCouplingLayer(
                self.channels, self.hidden_channels, self.kernel_size,
                self.dilation_rate, self.n_layers, gin_channels=self.gin_channels,
                mean_only=True, dtype=self.dtype, weight_norm=self.weight_norm,
                name=f"flows_{2 * i}",
            )
            for i in range(self.n_flows)
        ]

    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        g: jnp.ndarray | None = None,
        reverse: bool = False,
    ) -> jnp.ndarray:
        if not reverse:
            for coupling in self.couplings:
                x, _ = coupling(x, x_mask, g=g, reverse=False)
                x = flip_channels(x)
        else:
            for coupling in reversed(self.couplings):
                x = flip_channels(x)
                x = coupling(x, x_mask, g=g, reverse=True)
        return x


class Generator(nn.Module):
    """HiFi-GAN V1 decoder (ref: models.py:115-167).

    conv_pre -> 4x [lrelu -> weight-normed transposed-conv upsample -> MRF
    (mean of 3 ResBlocks)] -> lrelu -> conv_post -> tanh. Total upsampling
    prod(upsample_rates) == hop_length (256 for iitp_base).
    """

    initial_channel: int
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    gin_channels: int = 0
    # Space-to-depth packing for lane-starved (<128ch) late stages -- exact
    # math (see nn/conv.py pack_conv_weight). Measured on v5e (bench.py, 3x
    # repeats): full-model synthesis 92.5 ms/step packed vs 113.4 ms unpacked
    # (1000x vs 816x real time) -- packing wins in the fused full graph even
    # though isolated stage microbenchmarks favor the direct lowering.
    channel_pack: bool = True
    dtype: jnp.dtype = jnp.float32
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: jnp.ndarray | None = None) -> jnp.ndarray:
        num_kernels = len(self.resblock_kernel_sizes)
        res_cls = ResBlock1 if self.resblock == "1" else ResBlock2

        x = NormConv1d(self.upsample_initial_channel, 7, padding=3, dtype=self.dtype,
                       name="conv_pre")(x)
        if g is not None:
            x = x + NormConv1d(self.upsample_initial_channel, 1, dtype=self.dtype,
                               name="cond")(g)

        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = NormConvTranspose1d(
                ch, k, stride=u, padding=(k - u) // 2,
                weight_norm=self.weight_norm, dtype=self.dtype, name=f"ups_{i}",
            )(x)
            pack = max(1, min(8, 128 // ch)) if self.channel_pack else 1
            xs = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                block = res_cls(
                    ch, rk, tuple(rd), pack=pack, dtype=self.dtype,
                    weight_norm=self.weight_norm,
                    name=f"resblocks_{i * num_kernels + j}",
                )(x)
                xs = block if xs is None else xs + block
            x = xs / num_kernels

        x = nn.leaky_relu(x)  # default torch slope 0.01 here (models.py:156)
        x = NormConv1d(1, 7, padding=3, use_bias=False, dtype=self.dtype,
                       name="conv_post")(x)
        return jnp.tanh(x)


class SynthesizerTrn(nn.Module):
    """Top-level CVAE generator wiring (ref: models.py:261-349).

    Config keys ``filter_channels / n_heads / n_layers / kernel_size /
    p_dropout / n_layers_q`` are accepted-but-unused, mirroring the reference
    (models.py:290-294 -- no attention or text encoder in the executed graph).
    """

    spec_channels: int
    segment_size: int  # in frames (train.segment_size // hop_length)
    inter_channels: int = 192
    hidden_channels: int = 192
    resblock: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    n_speakers: int = 0
    gin_channels: int = 0
    use_spk_embed: bool = False
    # Encoder/flow depths: the reference hardcodes 16/16/8 (models.py:305-314);
    # configurable here for scaled variants and fast tests.
    enc_layers: int = 16
    flow_wn_layers: int = 8
    n_mels: int = 80
    dtype: jnp.dtype = jnp.float32
    weight_norm: bool = True
    # Space-to-depth packing of the decoder's lane-starved late stages
    # (Generator.channel_pack). Exact math either way; a pure layout choice,
    # A/B-able per process via tpu.channel_pack (scripts/ab_dec_pack.py).
    channel_pack: bool = True

    def setup(self):
        self.enc_p = MelEncoder(
            self.inter_channels, self.hidden_channels,
            n_layers=self.enc_layers, kernel_size=5, dilation_rate=1,
            gin_channels=self.gin_channels, n_mels=self.n_mels,
            dtype=self.dtype, weight_norm=self.weight_norm,
        )
        self.dec = Generator(
            self.inter_channels, self.resblock, self.resblock_kernel_sizes,
            self.resblock_dilation_sizes, self.upsample_rates,
            self.upsample_initial_channel, self.upsample_kernel_sizes,
            gin_channels=self.gin_channels, channel_pack=self.channel_pack,
            dtype=self.dtype, weight_norm=self.weight_norm,
        )
        self.enc_q = PosteriorEncoder(
            self.spec_channels, self.inter_channels, self.hidden_channels,
            5, 1, self.enc_layers, gin_channels=self.gin_channels, dtype=self.dtype,
            weight_norm=self.weight_norm,
        )
        self.flow = ResidualCouplingBlock(
            self.inter_channels, self.hidden_channels, 5, 1, self.flow_wn_layers,
            gin_channels=self.gin_channels, dtype=self.dtype, weight_norm=self.weight_norm,
        )
        if self.use_spk_embed and self.n_speakers > 0 and self.gin_channels > 0:
            self.emb_g = nn.Embed(self.n_speakers, self.gin_channels,
                                  param_dtype=jnp.float32)

    def _speaker(self, sid: jnp.ndarray | None) -> jnp.ndarray | None:
        if not self.use_spk_embed or sid is None:
            return None  # reference behaviour: g hard-forced to None (models.py:318, :332)
        return self.emb_g(sid)[:, None, :].astype(self.dtype)  # (B, 1, gin)

    def __call__(
        self,
        x: jnp.ndarray,        # mel (B, T, 80)
        x_lengths: jnp.ndarray,
        y: jnp.ndarray,        # linear spec (B, T, spec_channels)
        y_lengths: jnp.ndarray,
        rng: jax.Array,
        sid: jnp.ndarray | None = None,
    ):
        """Training forward (ref: models.py:317-329)."""
        g = self._speaker(sid)
        rng_post, rng_slice = jax.random.split(rng)

        _, m_p, logs_p, x_mask = self.enc_p(x, x_lengths)
        z, m_q, logs_q, y_mask = self.enc_q(y, y_lengths, rng_post, g=g)
        z_p = self.flow(z, y_mask, g=g)

        z_slice, ids_slice = rand_slice_segments(rng_slice, z, y_lengths, self.segment_size)
        o = self.dec(z_slice, g=g)
        return o, ids_slice, x_mask, y_mask, (z, z_p, m_p, logs_p, m_q, logs_q)

    def infer(
        self,
        x: jnp.ndarray,
        x_lengths: jnp.ndarray,
        rng: jax.Array,
        sid: jnp.ndarray | None = None,
        noise_scale: float = 1.0,
        max_len: Optional[int] = None,
        eps: jnp.ndarray | None = None,
        noise_scale_w: float = 0.8,
        length_scale: float = 1.0,
    ):
        """Sampling path (ref: models.py:331-339). ``noise_scale_w`` and
        ``length_scale`` are accepted-but-unused exactly as in the reference
        signature (no duration predictor remains, models.py:331-339) so
        callers ported verbatim from the notebook keep working.

        ``eps`` optionally supplies the prior noise (B, T, inter_channels)
        explicitly -- chunked long-form inference passes absolute-position
        slices of one full-length noise field so overlapping chunks see
        identical latents (seam-free stitching)."""
        g = self._speaker(sid)
        _, m_p, logs_p, x_mask = self.enc_p(x, x_lengths)
        if eps is None:
            eps = jax.random.normal(rng, m_p.shape, dtype=jnp.float32)
        eps = eps.astype(m_p.dtype)
        z_p = m_p + eps * jnp.exp(logs_p) * noise_scale
        z = self.flow(z_p, x_mask, g=g, reverse=True)
        z = (z * x_mask)[:, :max_len]
        o = self.dec(z, g=g)
        return o, x_mask, (z, z_p, m_p, logs_p)

    def voice_conversion(
        self,
        y: jnp.ndarray,
        y_lengths: jnp.ndarray,
        rng: jax.Array,
        sid_src: jnp.ndarray,
        sid_tgt: jnp.ndarray,
    ):
        """Source-speaker spec -> target-speaker waveform (ref: models.py:341-349,
        which crashes as shipped because ``emb_g`` is undefined; functional here
        when ``use_spk_embed`` is on)."""
        assert self.use_spk_embed and self.n_speakers > 0, \
            "voice_conversion requires use_spk_embed and n_speakers > 0"
        g_src = self.emb_g(sid_src)[:, None, :].astype(self.dtype)
        g_tgt = self.emb_g(sid_tgt)[:, None, :].astype(self.dtype)
        z, m_q, logs_q, y_mask = self.enc_q(y, y_lengths, rng, g=g_src)
        z_p = self.flow(z, y_mask, g=g_src)
        z_hat = self.flow(z_p, y_mask, g=g_tgt, reverse=True)
        o_hat = self.dec(z_hat * y_mask, g=g_tgt)
        return o_hat, y_mask, (z, z_p, z_hat)


def build_synthesizer(hps, dtype=jnp.float32, weight_norm: bool = True,
                      training: bool = False) -> SynthesizerTrn:
    """Construct from an HParams config exactly as train.py:82-86 does.

    ``training`` picks the decoder channel-pack default: the space-to-depth
    pack is exact math either way (params identical), but it is a LAYOUT
    choice whose win is shape-dependent -- measured on v5e it wins full-model
    serving (B=32 x 1000 frames: 92.5 vs 113.4 ms/step) and loses the
    training step's 32-frame slice decode badly (197.9 vs 68.7 ms/step,
    scripts/ab_dec_pack.py, both variants in one process). An explicit
    ``tpu.channel_pack`` in the config overrides both defaults."""
    if "tpu" in hps and "channel_pack" in hps.tpu:
        channel_pack = bool(hps.tpu.channel_pack)
    else:
        channel_pack = not training
    return SynthesizerTrn(
        spec_channels=hps.data.filter_length // 2 + 1,
        segment_size=hps.train.segment_size // hps.data.hop_length,
        inter_channels=hps.model.inter_channels,
        hidden_channels=hps.model.hidden_channels,
        resblock=hps.model.resblock,
        resblock_kernel_sizes=tuple(hps.model.resblock_kernel_sizes),
        resblock_dilation_sizes=tuple(tuple(d) for d in hps.model.resblock_dilation_sizes),
        upsample_rates=tuple(hps.model.upsample_rates),
        upsample_initial_channel=hps.model.upsample_initial_channel,
        upsample_kernel_sizes=tuple(hps.model.upsample_kernel_sizes),
        n_speakers=hps.data.n_speakers,
        gin_channels=hps.model.gin_channels,
        use_spk_embed=bool(hps.model.get("use_spk_embed", False)),
        enc_layers=int(hps.model.get("enc_layers", 16)),
        flow_wn_layers=int(hps.model.get("flow_wn_layers", 8)),
        n_mels=hps.data.n_mel_channels,
        dtype=dtype,
        weight_norm=weight_norm,
        channel_pack=channel_pack,
    )
