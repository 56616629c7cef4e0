"""Tests for weight-norm folding and the Vocoder inference API."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.inference import Vocoder
from smart_vocoder_tpu.models.synthesizer import SynthesizerTrn
from smart_vocoder_tpu.nn import WN, fold_weight_norm


class TestFoldWeightNorm:
    def test_wn_stack_identical_after_fold(self):
        mod = WN(16, 5, 1, 3, weight_norm=True)
        x = jax.random.normal(jax.random.key(0), (2, 20, 16))
        mask = jnp.ones((2, 20, 1))
        params = mod.init(jax.random.key(1), x, mask)["params"]
        want = mod.apply({"params": params}, x, mask)

        folded = fold_weight_norm(params)
        mod_f = WN(16, 5, 1, 3, weight_norm=False)
        got = mod_f.apply({"params": folded}, x, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)

    def test_fold_is_idempotent_on_plain_weights(self):
        params = {"conv": {"weight": jnp.ones((4, 2, 3)), "bias": jnp.zeros((4,))}}
        out = fold_weight_norm(params)
        np.testing.assert_array_equal(np.asarray(out["conv"]["weight"]), np.ones((4, 2, 3)))


def tiny_vocoder(tmp_path, ms=False):
    cfg = {
        "train": {
            "log_interval": 1, "eval_interval": 10, "seed": 0, "epochs": 1,
            "learning_rate": 2e-4, "betas": [0.8, 0.99], "eps": 1e-9,
            "batch_size": 1, "fp16_run": False, "lr_decay": 0.999875,
            "segment_size": 2048, "c_mel": 45, "c_kl": 1.0,
        },
        "data": {
            "training_files": "", "validation_files": "", "max_wav_value": 32768.0,
            "sampling_rate": 22050, "filter_length": 1024, "hop_length": 256,
            "win_length": 1024, "n_mel_channels": 80, "mel_fmin": 0.0,
            "mel_fmax": None, "n_speakers": 0,
        },
        "model": {
            "inter_channels": 32, "hidden_channels": 32, "resblock": "2",
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
            "upsample_rates": [8, 8, 2, 2], "upsample_initial_channel": 32,
            "upsample_kernel_sizes": [16, 16, 4, 4], "use_spectral_norm": False,
            "gin_channels": 0, "enc_layers": 2, "flow_wn_layers": 1,
        },
    }
    if ms:
        cfg["data"]["n_speakers"] = 4
        cfg["model"]["gin_channels"] = 16
        cfg["model"]["use_spk_embed"] = True
    path = os.path.join(str(tmp_path), "cfg.json")
    with open(path, "w") as f:
        json.dump(cfg, f)
    hps = load_config(path)

    from smart_vocoder_tpu.models import build_synthesizer

    net = build_synthesizer(hps)
    t = 64
    mel = jnp.zeros((1, t, 80))
    spec = jnp.zeros((1, t, 513))
    lens = jnp.full((1,), t, jnp.int32)
    sid = jnp.zeros((1,), jnp.int32) if ms else None
    params = net.init(jax.random.key(0), mel, lens, spec, lens,
                      jax.random.key(1), sid=sid)["params"]
    return hps, params


class TestVocoderAPI:
    def test_mel_to_wav_lengths_and_buckets(self, tmp_path):
        hps, params = tiny_vocoder(tmp_path)
        voc = Vocoder(hps, params, dtype=jnp.float32, buckets=(64, 128))
        rng = np.random.default_rng(0)
        mel = rng.normal(-4, 2, size=(2, 50, 80)).astype(np.float32)
        lengths = np.array([30, 50])
        outs = voc.mel_to_wav(mel, lengths)
        assert len(outs) == 2
        assert outs[0].shape == (30 * 256,)
        assert outs[1].shape == (50 * 256,)
        assert all(np.isfinite(o).all() for o in outs)

    def test_wav_to_wav_copy_synthesis(self, tmp_path):
        hps, params = tiny_vocoder(tmp_path)
        voc = Vocoder(hps, params, dtype=jnp.float32, buckets=(64,))
        t = np.arange(256 * 40) / 22050
        wav = np.sin(2 * np.pi * 440 * t).astype(np.float32) * 0.5
        out = voc.wav_to_wav(wav)
        assert out.shape == wav.shape
        assert np.isfinite(out).all()

    def test_chunked_matches_full(self, tmp_path):
        """Chunked long-form decode == one-shot decode away from chunk seams
        (noise_scale=0 makes the path deterministic)."""
        hps, params = tiny_vocoder(tmp_path)
        voc = Vocoder(hps, params, dtype=jnp.float32, buckets=(64, 128, 256, 512))
        rng = np.random.default_rng(1)
        t = 400
        mel = rng.normal(-4, 2, size=(t, 80)).astype(np.float32)

        full = voc.mel_to_wav(mel[None], np.array([t]), noise_scale=0.0)[0]
        chunked = voc.mel_to_wav_chunked(mel, chunk=128, overlap=32, noise_scale=0.0)
        assert chunked.shape == full.shape
        # compare away from the absolute start/end (identical there too, but
        # bucket padding differences make edge frames the only risk)
        hop = 256
        np.testing.assert_allclose(
            chunked[2 * hop : -2 * hop], full[2 * hop : -2 * hop], atol=2e-4,
        )

    def test_from_torch_checkpoint_keeps_emb_g(self, tmp_path):
        """Loading a speaker-conditioned G_*.pth must preserve emb_g.

        Regression: the param template used for the partial-tolerant merge was
        built by an init without sid, so emb_g never entered the template and
        the loaded model crashed on any sid-conditioned apply.
        """
        hps, params = tiny_vocoder(tmp_path, ms=True)
        assert "emb_g" in params  # sanity: ms init creates the embedding

        from smart_vocoder_tpu.utils.torch_compat import save_torch_checkpoint

        pth = os.path.join(str(tmp_path), "G_0.pth")
        save_torch_checkpoint(pth, params, iteration=0, learning_rate=2e-4)
        voc = Vocoder.from_torch_checkpoint(
            os.path.join(str(tmp_path), "cfg.json"), pth,
            dtype=jnp.float32, buckets=(64,))
        assert "emb_g" in voc.params
        rng = np.random.default_rng(0)
        mel = rng.normal(-4, 2, size=(1, 50, 80)).astype(np.float32)
        outs = voc.mel_to_wav(mel, np.array([50]), sid=np.array([1]))
        assert outs[0].shape == (50 * 256,)
        assert np.isfinite(outs[0]).all()

    def test_chunked_short_input_passthrough(self, tmp_path):
        hps, params = tiny_vocoder(tmp_path)
        voc = Vocoder(hps, params, dtype=jnp.float32, buckets=(64,))
        mel = np.zeros((40, 80), np.float32) - 4
        out = voc.mel_to_wav_chunked(mel, chunk=128, overlap=16, noise_scale=0.0)
        assert out.shape == (40 * 256,)

    def test_fold_matches_unfolded(self, tmp_path):
        hps, params = tiny_vocoder(tmp_path)
        mel = np.zeros((1, 64, 80), np.float32) - 4.0
        a = Vocoder(hps, params, dtype=jnp.float32, buckets=(64,), fold=True)
        b = Vocoder(hps, params, dtype=jnp.float32, buckets=(64,), fold=False)
        wa = a.mel_to_wav(mel, seed=7)[0]
        wb = b.mel_to_wav(mel, seed=7)[0]
        np.testing.assert_allclose(wa, wb, atol=2e-5)


    def test_infer_accepts_reference_kwargs(self, tmp_path):
        """The reference signature's accepted-but-unused noise_scale_w /
        length_scale kwargs (ref models.py:331-339) must not crash a caller
        ported verbatim from the notebook, and must not change the output."""
        from smart_vocoder_tpu.models import build_synthesizer

        hps, params = tiny_vocoder(tmp_path)
        net = build_synthesizer(hps)
        mel = jnp.zeros((1, 64, 80)) - 4.0
        lens = jnp.full((1,), 64, jnp.int32)
        a = net.apply({"params": params}, mel, lens, jax.random.key(0),
                      noise_scale=0.667, noise_scale_w=0.8, length_scale=1,
                      method=SynthesizerTrn.infer)[0]
        b = net.apply({"params": params}, mel, lens, jax.random.key(0),
                      noise_scale=0.667, method=SynthesizerTrn.infer)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestChunkedNoiseConsistency:
    def test_chunk_size_invariance_with_noise(self, tmp_path):
        """With noise_scale > 0 the prior noise is one full-length field
        sliced by absolute position, so different chunkings produce the same
        waveform (ADVICE round-1: per-chunk RNG made overlap latents disagree
        and could leave seams)."""
        from tests.test_inference_api import tiny_vocoder  # self-import safe under pytest

        hps, params = tiny_vocoder(tmp_path)
        voc = Vocoder(hps, params, dtype=jnp.float32, buckets=(64, 128, 256, 512))
        rng = np.random.default_rng(2)
        t = 384
        mel = rng.normal(-4, 2, size=(t, 80)).astype(np.float32)

        a = voc.mel_to_wav_chunked(mel, chunk=128, overlap=32, noise_scale=0.7, seed=5)
        b = voc.mel_to_wav_chunked(mel, chunk=256, overlap=48, noise_scale=0.7, seed=5)
        assert a.shape == b.shape
        hop = 256
        np.testing.assert_allclose(a[2 * hop: -2 * hop], b[2 * hop: -2 * hop], atol=2e-4)


class TestStreaming:
    def test_stream_equals_chunked(self, tmp_path):
        """Streaming over arbitrary piece sizes concatenates to exactly the
        chunked (and thus the full) synthesis, including ragged tails."""
        hps, params = tiny_vocoder(tmp_path)
        voc = Vocoder(hps, params, dtype=jnp.float32, buckets=(64, 128, 256))
        rng = np.random.default_rng(4)
        t = 300
        mel = rng.normal(-4, 2, size=(t, 80)).astype(np.float32)

        want = voc.mel_to_wav_chunked(mel, chunk=128, overlap=32,
                                      noise_scale=0.7, seed=9)
        # ragged incoming pieces: 37, 1, 100, 62, 100 frames
        cuts = [0, 37, 38, 138, 200, 300]
        pieces = [mel[a:b] for a, b in zip(cuts[:-1], cuts[1:])]
        got = list(voc.stream_mel_to_wav(iter(pieces), chunk=128, overlap=32,
                                         noise_scale=0.7, seed=9))
        assert len(got) > 1
        np.testing.assert_allclose(np.concatenate(got), want, rtol=0, atol=0)

    def test_stream_first_chunk_latency(self, tmp_path):
        """A window is emitted as soon as step+overlap = chunk-overlap frames
        are buffered -- the live-TTS first-audio latency contract (SURVEY 5
        long-context row; docs/ARCHITECTURE.md latency table)."""
        hps, params = tiny_vocoder(tmp_path)
        voc = Vocoder(hps, params, dtype=jnp.float32, buckets=(128,))
        chunk, overlap = 128, 32
        latency = chunk - overlap  # 96 frames
        emitted = []

        def feed():
            # one frame at a time; record how many frames were handed over
            # before the first wav piece comes back
            for i in range(300):
                emitted.append(i + 1)
                yield np.zeros((1, 80), np.float32) - 4

        gen = voc.stream_mel_to_wav(feed(), chunk=chunk, overlap=overlap,
                                    noise_scale=0.0)
        first = next(gen)
        frames_buffered = emitted[-1]
        assert frames_buffered == latency, (frames_buffered, latency)
        # the first piece covers step = chunk - 2*overlap frames of audio
        assert first.shape == ((chunk - 2 * overlap) * 256,)

    def test_window_ingraph_eps_matches_host_eps(self, tmp_path):
        """_synth_window's in-graph positional eps (one dispatch/readback per
        window) matches materializing the same positional noise host-side and
        passing it through ``mel_to_wav(eps=...)`` to ULP-level tolerance
        (same fold_in stream; only compiler fusion of the in-graph normal
        draw reorders f32 rounding) -- the round-4 streaming-latency change
        must not perceptibly move any sample."""
        hps, params = tiny_vocoder(tmp_path)
        voc = Vocoder(hps, params, dtype=jnp.float32, buckets=(128,))
        rng = np.random.default_rng(7)
        n, chunk, lo, seed = 90, 128, 55, 3
        mel = rng.normal(-4, 2, size=(n, 80)).astype(np.float32)

        got = voc._synth_window(mel, lo, chunk, 0.7, None, seed)

        eps = voc._positional_eps(seed, lo, chunk)[:n]
        mel_p = np.pad(mel, ((0, chunk - n), (0, 0)))
        eps_p = np.pad(eps, ((0, chunk - n), (0, 0)))
        want = voc.mel_to_wav(mel_p[None], np.array([n]), noise_scale=0.7,
                              seed=seed, eps=eps_p[None])[0]
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)

    def test_stream_short_input_single_window(self, tmp_path):
        hps, params = tiny_vocoder(tmp_path)
        voc = Vocoder(hps, params, dtype=jnp.float32, buckets=(64, 128))
        mel = np.zeros((40, 80), np.float32) - 4
        got = np.concatenate(list(voc.stream_mel_to_wav([mel], chunk=128,
                                                        overlap=16)))
        want = voc.mel_to_wav_chunked(mel, chunk=128, overlap=16)
        np.testing.assert_array_equal(got, want)
        assert got.shape == (40 * 256,)
