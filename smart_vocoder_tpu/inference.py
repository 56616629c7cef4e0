"""Inference API (L9): the mel->wav product path of inference.ipynb.

``Vocoder`` wraps a jitted, weight-norm-folded ``SynthesizerTrn.infer`` with
bucketed padding so arbitrary-length inputs reuse a bounded set of compiled
programs. Loads either native orbax checkpoints or reference ``G_*.pth``
files (notebook cells 2-4: get_hparams_from_file -> SynthesizerTrn ->
load_checkpoint -> infer(noise_scale=.667)).
"""

from __future__ import annotations

import bisect
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smart_vocoder_tpu.config import HParams, load_config
from smart_vocoder_tpu.models import build_synthesizer
from smart_vocoder_tpu.models.synthesizer import SynthesizerTrn
from smart_vocoder_tpu.ops import MelConfig, mel_spectrogram, spec_to_mel, spectrogram


class Vocoder:
    """mel (B, T, 80) or wav -> waveform synthesis with static-shape buckets."""

    def __init__(
        self,
        hps: HParams,
        params_g,
        dtype=jnp.bfloat16,
        buckets: Sequence[int] = (64, 128, 256, 512, 1024, 2048, 4096),
        fold: bool = True,
        use_pallas: bool | None = None,
        use_pallas_wn: bool | None = None,
        hifi: bool | int | None = None,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``'data'`` axis for
        multi-chip serving -- the batch is sharded over it (params
        replicated) via shard_map; inference is embarrassingly data-parallel
        (no cross-batch ops), so the Pallas fast paths run unchanged on each
        shard. ``mel_to_wav`` pads the batch to a multiple of the axis size."""
        self.hps = hps
        from smart_vocoder_tpu.utils.compile_cache import enable_compilation_cache
        enable_compilation_cache(hps.tpu.get("compilation_cache", True))
        self.mel_cfg = MelConfig.from_hparams(hps)
        self.buckets = sorted(buckets)
        if use_pallas is None:
            use_pallas = bool(hps.tpu.get("use_pallas", False))
        # Fast decoder supports the ResBlock1 family (both shipped configs).
        self.use_pallas = use_pallas and fold and hps.model.resblock == "1"
        # Fused WN stacks (kernels/encoder.py) are OFF by default: measured on
        # v5e (scripts/bench_wn_path.py, readback-synced) the Pallas path runs
        # the B=32 x 1000-frame prior+flow in 16.6-18.7 ms across all
        # (tile, layers_per_call) configs vs 14.7 ms for XLA's convs -- the
        # pack-2 block-Toeplitz layout inflates MACs ~1.33x (the 1x1 res/skip
        # conv computes its block-diagonal structure densely, 2x) while XLA
        # already runs the k=5 convs at ~55% of bf16 roofline. Needs the
        # 128-lane row packing (hidden 192 -> 384) of the shipped configs.
        if use_pallas_wn is None:
            use_pallas_wn = bool(hps.tpu.get("use_pallas_wn", False))
        self.use_pallas_wn = bool(
            use_pallas_wn and fold
            and hps.model.hidden_channels % 64 == 0
        )
        # Serving-fidelity islands (kernels/decoder.py hifi_tail ladder,
        # measured in scripts/fidelity_frontier.py): level 1 = the
        # waveform-adjacent tail (f32 activations on the last two stages,
        # 2-pass hi/lo bf16 matmuls on the last); level 2 (the headline,
        # True maps here) also keeps the early decoder in f32 storage with
        # single-bf16 MXU operands AND runs the prior+flow through the f32
        # module graph -- mel-L1 0.0048 vs 0.0087 (level 1) / ~0.024 (off),
        # at ~8% RTF cost over level 1. Pass hifi=False/0 for the
        # max-throughput path (bench.py --fast), or an explicit int level.
        if hifi is None:
            hifi = hps.tpu.get("hifi_tail", True)
        hifi = 2 * int(hifi) if isinstance(hifi, bool) else int(hifi)
        self.hifi = hifi if (self.use_pallas and dtype == jnp.bfloat16) else 0
        if fold:
            # Bake g*v/||v|| into plain weights -- the TPU analogue of the
            # reference's remove_weight_norm() before inference (models.py:162).
            from smart_vocoder_tpu.nn import fold_weight_norm

            params_g = fold_weight_norm(params_g)
            self.net = build_synthesizer(hps, dtype=dtype, weight_norm=False)
        else:
            self.net = build_synthesizer(hps, dtype=dtype)
        # hifi >= 2: the prior+flow runs through the f32 module graph (f32
        # activations, DEFAULT-precision matmuls -- bf16 MXU operands); costs
        # ~6 ms of the B=32x1000 step and removes the prior's 0.0032 mel-L1
        # term (scripts/bisect_fidelity3.py / fidelity_frontier.py).
        self._net_prior = (build_synthesizer(hps, weight_norm=False)
                           if self.hifi >= 2 and fold else self.net)
        self.params = params_g
        self.dtype = dtype
        if self.use_pallas or self.use_pallas_wn:
            from smart_vocoder_tpu.kernels.decoder import DecoderConfig

            dec_cfg = DecoderConfig.from_hparams(hps) if self.use_pallas else None
            apply_fn = partial(self._apply_infer_fast, self.net,
                               self._net_prior, dec_cfg, dtype,
                               self.use_pallas_wn, self.hifi)
        else:
            apply_fn = partial(self._apply_infer, self.net)
        self._apply_fn = apply_fn  # reused by serving.StreamServer
        self.mesh = mesh
        if mesh is None:
            self._infer = jax.jit(apply_fn, static_argnames=("noise_scale",))
        else:
            self._infer = self._make_sharded_infer(apply_fn, mesh)

    @staticmethod
    def _make_sharded_infer(apply_fn, mesh):
        """Batch-sharded serving over the mesh's 'data' axis.

        shard_map (not pjit partitioning) so every inner op -- including
        pallas_call kernels -- runs per-shard on its local batch slice with
        no partitioner involvement. Prior noise is derived per GLOBAL batch
        element (``_batch_eps`` with offset = shard * local_batch), so the
        same seed produces the same audio regardless of mesh size --
        bit-compatible with the mesh=None path (explicit ``eps`` bypasses
        the derivation and is itself sharded)."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        def infer(params, mel, lengths, rng, noise_scale, sid=None, eps=None):
            def local(params, mel, lengths, rng, sid, eps):
                offset = jax.lax.axis_index("data") * mel.shape[0]
                return apply_fn(params, mel, lengths, rng, noise_scale,
                                sid=sid, eps=eps, batch_offset=offset)

            return shard_map(
                local, mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P(), P("data"), P("data")),
                out_specs=(P("data"), P("data")),
                check_rep=False,
            )(params, mel, lengths, rng, sid, eps)

        return jax.jit(infer, static_argnames=("noise_scale",))

    @staticmethod
    def _positional_eps_graph(rng, start, b, t, c):
        """In-graph twin of ``_positional_eps``: frame ``start + i`` draws
        ``normal(fold_in(rng, start + i))`` -- bit-identical to the host-side
        helper, but traced into the infer program so a streaming window costs
        ONE dispatch + ONE readback instead of two of each (the eps program's
        round-trip dominates B=1 window latency over a tunneled backend).
        Frames beyond the true window length get noise instead of the
        host path's zero padding; both are masked out of every valid output
        sample (pre/WN/post are mask-multiplied, nn/coupling.py:55-74)."""
        idx = start + jnp.arange(t)
        eps = jax.vmap(
            lambda i: jax.random.normal(jax.random.fold_in(rng, i), (c,),
                                        jnp.float32)
        )(idx)
        return jnp.broadcast_to(eps[None], (b, t, c))

    @staticmethod
    def _batch_eps(rng, offset, b, t, c):
        """Prior noise derived per global batch element: row i draws from
        ``fold_in(rng, offset + i)``, so the noise a given element sees is
        independent of mesh topology and batch padding."""
        idx = offset + jnp.arange(b)
        return jax.vmap(
            lambda i: jax.random.normal(jax.random.fold_in(rng, i), (t, c),
                                        jnp.float32)
        )(idx)

    @staticmethod
    def _apply_infer(net, params, mel, lengths, rng, noise_scale, sid=None,
                     eps=None, batch_offset=0, eps_start=None):
        if eps is None:
            if eps_start is not None:
                eps = Vocoder._positional_eps_graph(
                    rng, eps_start, mel.shape[0], mel.shape[1],
                    net.inter_channels)
            else:
                eps = Vocoder._batch_eps(rng, batch_offset, mel.shape[0],
                                         mel.shape[1], net.inter_channels)
        o, mask, _ = net.apply(
            {"params": params}, mel, lengths, rng,
            sid=sid, noise_scale=noise_scale, eps=eps, method=SynthesizerTrn.infer,
        )
        return o, mask

    @staticmethod
    def _apply_infer_fast(net, net_prior, dec_cfg, dtype, use_pallas_wn, hifi,
                          params, mel, lengths, rng, noise_scale, sid=None,
                          eps=None, batch_offset=0, eps_start=None):
        """Prior + reverse flow through the fused-WN functional path
        (kernels/encoder.py), decoder through the fused MRF fast path
        (kernels/decoder.py); either piece falls back to the module graph
        when disabled or (for the WN kernel) when speaker-conditioned.
        ``net_prior`` is the f32 module at hifi >= 2, else ``net``."""
        from smart_vocoder_tpu.ops import sequence_mask

        interpret = jax.default_backend() != "tpu"  # CPU runs the interpreter
        conditioned = net.use_spk_embed and sid is not None
        if eps is None:
            if eps_start is not None:
                eps = Vocoder._positional_eps_graph(
                    rng, eps_start, mel.shape[0], mel.shape[1],
                    net.inter_channels)
            else:
                eps = Vocoder._batch_eps(rng, batch_offset, mel.shape[0],
                                         mel.shape[1], net.inter_channels)

        if use_pallas_wn and not conditioned:
            mask = sequence_mask(lengths, mel.shape[1]).astype(dtype)
            from smart_vocoder_tpu.kernels.encoder import prior_flow_apply

            z = prior_flow_apply(
                params, mel, mask, eps, noise_scale,
                enc_layers=net.enc_layers, flow_wn_layers=net.flow_wn_layers,
                hidden=net.hidden_channels, interpret=interpret, dtype=dtype,
            )
            g = None
        else:
            def prior_latent(n, mel, lengths, rng, sid, eps):
                g = n._speaker(sid)
                _, m_p, logs_p, mask = n.enc_p(mel, lengths)
                if eps is None:
                    eps = jax.random.normal(rng, m_p.shape, jnp.float32)
                z_p = m_p + eps.astype(m_p.dtype) * jnp.exp(logs_p) * noise_scale
                z = n.flow(z_p, mask, g=g, reverse=True)
                return z * mask, mask, g

            z, mask, g = net_prior.apply(
                {"params": params}, mel, lengths, rng, sid, eps, method=prior_latent,
            )

        if dec_cfg is not None:
            from smart_vocoder_tpu.kernels.decoder import decoder_apply

            o = decoder_apply(
                params["dec"], z, dec_cfg, g=g, use_pallas=True, dtype=dtype,
                interpret=interpret, hifi_tail=hifi,
            )
        else:
            o = net.apply({"params": params}, z, g, method=lambda n, z, g: n.dec(z, g=g))
        return o, mask

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_torch_checkpoint(cls, config_path: str, pth_path: str, **kw) -> "Vocoder":
        """Load a reference G_*.pth (notebook cell 3)."""
        from smart_vocoder_tpu.utils.checkpoint import load_reference_generator

        hps = load_config(config_path)
        net = build_synthesizer(hps)
        t = max(64, hps.train.segment_size // hps.data.hop_length * 2)
        mel = jnp.zeros((1, t, hps.data.n_mel_channels))
        spec = jnp.zeros((1, t, hps.data.filter_length // 2 + 1))
        lens = jnp.full((1,), t, jnp.int32)
        # Speaker-conditioned models only create emb_g when init sees a sid
        # (ref models.py:331-340); without it the param template lacks emb_g
        # and the partial-tolerant merge below would silently drop it, then
        # any sid-conditioned apply fails with a missing-param error.
        sid = (jnp.zeros((1,), jnp.int32)
               if hps.model.get("use_spk_embed", False) else None)
        params = net.init(jax.random.key(0), mel, lens, spec, lens,
                          jax.random.key(1), sid=sid)["params"]
        params, _ = load_reference_generator(pth_path, params)
        return cls(hps, params, **kw)

    @classmethod
    def from_orbax_checkpoint(cls, config_path: str, model_dir: str, **kw) -> "Vocoder":
        from smart_vocoder_tpu.models import MultiPeriodDiscriminator
        from smart_vocoder_tpu.training.loop import _synthetic_init_batch
        from smart_vocoder_tpu.training.optim import make_optimizer
        from smart_vocoder_tpu.training.step import init_train_state
        from smart_vocoder_tpu.utils.checkpoint import CheckpointManager

        hps = load_config(config_path)
        net_g = build_synthesizer(hps)
        net_d = MultiPeriodDiscriminator(hps.model.get("use_spectral_norm", False))
        tx = make_optimizer(hps)
        # Structure only: orbax restores into shapes, so eval_shape avoids
        # materializing a throwaway train state (op-by-op init is
        # pathologically slow over tunneled backends).
        batch = _synthetic_init_batch(hps, 1)
        state_shape = jax.eval_shape(
            lambda k: init_train_state(hps, net_g, net_d, tx, tx, k, batch),
            jax.random.key(0),
        )
        mngr = CheckpointManager(model_dir)
        state, _, _ = mngr.restore(state_shape)
        return cls(hps, jax.tree.map(jnp.asarray, state.params_g), **kw)

    # -- synthesis -----------------------------------------------------------
    def _bucket(self, t: int) -> int:
        i = bisect.bisect_left(self.buckets, t)
        return self.buckets[i] if i < len(self.buckets) else t

    def warmup(self, chunks: Optional[Sequence[int]] = None,
               sid: Optional[np.ndarray] = None) -> None:
        """Pre-compile AND pre-execute the window program for each chunk size
        (default: every bucket), so a live session's first request pays
        neither the 20-40 s compile nor the first-dispatch overhead --
        first-audio latency becomes the steady-state window compute
        (docs/ARCHITECTURE.md Live-TTS table). Pass ``sid`` when serving a
        speaker-conditioned model (a different program signature)."""
        n_mels = int(self.hps.data.n_mel_channels)
        for c in chunks or self.buckets:
            self._synth_window(np.zeros((c, n_mels), np.float32), 0, c,
                               0.667, sid, 0)

    def mel_to_wav(
        self,
        mel: np.ndarray,
        lengths: Optional[np.ndarray] = None,
        noise_scale: float = 0.667,
        sid: Optional[np.ndarray] = None,
        seed: int = 0,
        eps: Optional[np.ndarray] = None,
    ) -> list[np.ndarray]:
        """mel (B, T, n_mels) -> list of B float32 waveforms (true lengths).

        ``seed`` pins the prior noise per batch element (row i draws from
        ``fold_in(key(seed), i)``), independent of mesh topology and batch
        padding -- the same (mel, seed) yields the same audio on mesh=None
        and any data-mesh size. ``eps`` optionally pins the noise explicitly
        (B, T, inter_channels); padded with zeros to the bucket boundary
        like the mel."""
        mel = np.asarray(mel, np.float32)
        b, t, _ = mel.shape
        if lengths is None:
            lengths = np.full((b,), t, np.int64)
        padded_t = self._bucket(t)
        if padded_t > t:
            mel = np.pad(mel, ((0, 0), (0, padded_t - t), (0, 0)))
            if eps is not None:
                eps = np.pad(np.asarray(eps, np.float32),
                             ((0, 0), (0, padded_t - eps.shape[1]), (0, 0)))
        dp = 1 if self.mesh is None else int(self.mesh.shape["data"])
        pad_b = -b % dp
        if pad_b:  # batch must tile the mesh's data axis
            mel = np.pad(mel, ((0, pad_b), (0, 0), (0, 0)))
            lengths = np.concatenate([lengths, np.full((pad_b,), padded_t, np.int64)])
            if sid is not None:
                sid = np.concatenate([np.asarray(sid), np.zeros((pad_b,), np.int64)])
            if eps is not None:
                eps = np.pad(np.asarray(eps, np.float32),
                             ((0, pad_b), (0, 0), (0, 0)))
        o, _ = self._infer(
            self.params, jnp.asarray(mel), jnp.asarray(lengths, jnp.int32),
            jax.random.key(seed), noise_scale=noise_scale,
            sid=None if sid is None else jnp.asarray(sid, jnp.int32),
            eps=None if eps is None else jnp.asarray(eps, jnp.float32),
        )
        o = np.asarray(jax.device_get(o), np.float32)
        hop = self.hps.data.hop_length
        return [o[i, : int(lengths[i]) * hop, 0] for i in range(b)]

    def _positional_eps(self, seed: int, start: int, n: int) -> np.ndarray:
        """Prior noise derived from ABSOLUTE frame position: frame t's latent
        noise is ``normal(fold_in(key(seed), t))`` regardless of which
        window/chunk requests it. Overlapping windows therefore see identical
        latents (seam-free stitching) and streaming needs no lookahead into a
        pre-materialized full-length field."""
        inter = int(self.hps.model.inter_channels)

        fns = getattr(self, "_eps_fns", None)
        if fns is None:
            fns = self._eps_fns = {}
        if n not in fns:
            def eps_fn(key, start, n=n):
                idx = start + jnp.arange(n)
                return jax.vmap(
                    lambda i: jax.random.normal(jax.random.fold_in(key, i),
                                                (inter,), jnp.float32)
                )(idx)
            fns[n] = jax.jit(eps_fn)
        return np.asarray(fns[n](jax.random.key(seed), jnp.int32(start)))

    def _synth_window(self, mel_win: np.ndarray, lo: int, chunk: int,
                      noise_scale: float, sid, seed: int) -> np.ndarray:
        """Decode one window (absolute frames [lo, lo+len)) padded to
        ``chunk`` frames -- one compiled program serves every window.

        mesh=None derives the positional prior noise IN-GRAPH
        (``_positional_eps_graph``): one dispatch + one readback per window,
        ~2x fewer tunnel round-trips than materializing eps host-side --
        that round-trip was the dominant term in B=1 first-audio latency
        (docs/ARCHITECTURE.md Live-TTS table). Output matches the host-eps
        path to ULP tolerance (same fold_in stream; padded frames are
        masked; only compiler fusion reorders f32 rounding)."""
        n = mel_win.shape[0]
        if self.mesh is not None:  # sharded program keeps the host-eps path
            eps = self._positional_eps(seed, lo, chunk)[:n]
            pad = chunk - n
            if pad > 0:
                mel_win = np.pad(mel_win, ((0, pad), (0, 0)))
                eps = np.pad(eps, ((0, pad), (0, 0)))
            return self.mel_to_wav(
                mel_win[None], np.array([n]), noise_scale=noise_scale,
                sid=sid, seed=seed, eps=eps[None],
            )[0]
        pad = chunk - n
        if pad > 0:
            mel_win = np.pad(np.asarray(mel_win, np.float32), ((0, pad), (0, 0)))
        o, _ = self._infer(
            self.params, jnp.asarray(mel_win, jnp.float32)[None],
            jnp.full((1,), n, jnp.int32), jax.random.key(seed),
            noise_scale=noise_scale,
            sid=None if sid is None else jnp.asarray(sid, jnp.int32),
            eps=None, eps_start=jnp.int32(lo),
        )
        hop = self.hps.data.hop_length
        return np.asarray(jax.device_get(o), np.float32)[0, : n * hop, 0]

    def mel_to_wav_chunked(
        self,
        mel: np.ndarray,
        chunk: int = 1024,
        overlap: int = 128,
        noise_scale: float = 0.667,
        sid: Optional[np.ndarray] = None,
        seed: int = 0,
    ) -> np.ndarray:
        """Unbounded-length synthesis via fixed-size chunking with
        receptive-field overlap (SURVEY.md section 5, long-context row).

        The model is fully convolutional: every output sample depends only on
        a local mel window (prior WN radius 32 + flow 4x WN8 radius 64 ~= 96
        frames), so decoding overlapping chunks and keeping each chunk's
        interior is seam-free once ``overlap`` exceeds the receptive radius.
        One compiled program (`chunk` frames) serves any input length. Prior
        noise comes from ``_positional_eps`` (identical latents in overlaps;
        bit-identical to ``stream_mel_to_wav`` on the same inputs).

        mel: (T, n_mels) or (1, T, n_mels) -> (T * hop,) float32 waveform.
        """
        mel = np.asarray(mel, np.float32)
        if mel.ndim == 3:
            mel = mel[0]
        t = mel.shape[0]
        hop = self.hps.data.hop_length
        assert overlap < chunk // 2, (overlap, chunk)
        step = chunk - 2 * overlap
        if t <= step:
            # single window, positional eps -- matches stream_mel_to_wav's
            # single-window case bit-for-bit
            return self._synth_window(mel, 0, chunk, noise_scale, sid, seed)
        out = np.zeros(t * hop, np.float32)
        start = 0
        while start < t:
            lo = max(0, start - overlap)
            hi = min(t, start + step + overlap)
            wav = self._synth_window(mel[lo:hi], lo, chunk, noise_scale, sid, seed)
            keep_lo = start - lo            # frames trimmed at the front
            keep_hi = min(hi, start + step)  # absolute end frame of kept region
            out[start * hop : keep_hi * hop] = wav[keep_lo * hop : (keep_lo + keep_hi - start) * hop]
            start += step
        return out

    def stream_mel_to_wav(
        self,
        mel_chunks,
        chunk: int = 1024,
        overlap: int = 128,
        noise_scale: float = 0.667,
        sid: Optional[np.ndarray] = None,
        seed: int = 0,
    ):
        """Streaming synthesis: consume mel pieces as they arrive, yield
        waveform pieces in order (live-TTS serving; SURVEY.md section 5's
        "chunked/streaming conv eval" long-context answer).

        ``mel_chunks`` is any iterable of ``(T_i, n_mels)`` (or
        ``(1, T_i, n_mels)``) arrays of arbitrary, varying sizes. Output
        pieces concatenate to EXACTLY ``mel_to_wav_chunked`` of the full mel
        with the same (chunk, overlap, seed): windows are cut at the same
        absolute frame boundaries and the prior noise is position-derived.
        Latency: a window is emitted once ``step + overlap`` frames beyond
        its start are buffered (``step = chunk - 2*overlap``); memory is
        O(chunk) regardless of stream length.
        """
        assert overlap < chunk // 2, (overlap, chunk)
        hop = self.hps.data.hop_length
        step = chunk - 2 * overlap
        n_mels = int(self.hps.data.n_mel_channels)

        buf = np.zeros((0, n_mels), np.float32)
        buf0 = 0   # absolute frame index of buf[0]
        start = 0  # absolute frame cursor of the next emission

        def emit(start, end_limit):
            lo = max(0, start - overlap)
            hi = min(end_limit, start + step + overlap)
            wav = self._synth_window(buf[lo - buf0 : hi - buf0], lo, chunk,
                                     noise_scale, sid, seed)
            keep_hi = min(hi, start + step)
            return wav[(start - lo) * hop : (keep_hi - lo) * hop], keep_hi

        for piece in mel_chunks:
            piece = np.asarray(piece, np.float32)
            if piece.ndim == 3:
                piece = piece[0]
            buf = np.concatenate([buf, piece])
            while buf0 + len(buf) >= start + step + overlap:
                wav, new_start = emit(start, buf0 + len(buf))
                yield wav
                start = new_start
                keep_from = max(0, start - overlap - buf0)
                buf = buf[keep_from:]
                buf0 += keep_from

        end = buf0 + len(buf)
        while start < end:  # flush the tail
            wav, new_start = emit(start, end)
            yield wav
            start = new_start

    def wav_to_wav(self, wav: np.ndarray, **kw) -> np.ndarray:
        """Copy-synthesis: waveform -> mel -> waveform (notebook cell 4)."""
        wav = np.asarray(wav, np.float32).reshape(1, -1)
        usable = (wav.shape[1] // self.hps.data.hop_length) * self.hps.data.hop_length
        wav = wav[:, :usable]
        spec = spectrogram(jnp.asarray(wav), self.mel_cfg)
        mel = spec_to_mel(spec, self.mel_cfg)
        return self.mel_to_wav(np.asarray(mel), **kw)[0]
