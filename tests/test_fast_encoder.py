"""Functional fused-WN prior/flow path parity vs the flax module graph."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_vocoder_tpu.kernels.encoder import (
    enc_p_apply,
    flow_reverse_apply,
    prior_flow_apply,
)
from smart_vocoder_tpu.models.synthesizer import MelEncoder, ResidualCouplingBlock
from smart_vocoder_tpu.ops import sequence_mask


def _mel_encoder(n_layers=4, hidden=192, inter=192):
    net = MelEncoder(inter, hidden, n_layers=n_layers, weight_norm=False)
    mel = jax.random.normal(jax.random.key(0), (2, 64, 80))
    lens = jnp.array([64, 50])
    params = net.init(jax.random.key(1), mel, lens)["params"]
    return net, params, mel, lens


@pytest.mark.parametrize("use_pallas", [True, False])
def test_enc_p_apply_matches_module(use_pallas):
    net, params, mel, lens = _mel_encoder()
    _, m_want, logs_want, mask = net.apply({"params": params}, mel, lens)
    m_got, logs_got = enc_p_apply(
        params, mel, mask, n_layers=4, hidden=192,
        use_pallas=use_pallas, interpret=True, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(m_got), np.asarray(m_want),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logs_got), np.asarray(logs_want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("use_pallas", [True, False])
def test_flow_reverse_apply_matches_module(use_pallas):
    net = ResidualCouplingBlock(192, 192, 5, 1, n_layers=4, weight_norm=False)
    z_p = jax.random.normal(jax.random.key(2), (2, 64, 192)) * 0.5
    lens = jnp.array([64, 40])
    mask = sequence_mask(lens, 64).astype(jnp.float32)
    params = net.init(jax.random.key(3), z_p, mask)["params"]
    want = net.apply({"params": params}, z_p * mask, mask, reverse=True)
    got = flow_reverse_apply(
        params, z_p * mask, mask, n_flows=4, n_layers=4, hidden=192,
        use_pallas=use_pallas, interpret=True, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want * mask),
                               rtol=3e-4, atol=3e-4)


def test_prior_flow_apply_full_stack():
    """End-to-end prior+flow vs composing the two module stages."""
    enc, enc_params, mel, lens = _mel_encoder(n_layers=3)
    flow = ResidualCouplingBlock(192, 192, 5, 1, n_layers=3, weight_norm=False)
    mask = sequence_mask(lens, mel.shape[1]).astype(jnp.float32)
    eps = jax.random.normal(jax.random.key(4), (2, mel.shape[1], 192))
    flow_params = flow.init(jax.random.key(5), eps, mask)["params"]

    _, m_p, logs_p, _ = enc.apply({"params": enc_params}, mel, lens)
    z_p = m_p + eps * jnp.exp(logs_p) * 0.667
    want = flow.apply({"params": flow_params}, z_p, mask, reverse=True) * mask

    got = prior_flow_apply(
        {"enc_p": enc_params, "flow": flow_params}, mel, mask, eps, 0.667,
        enc_layers=3, flow_wn_layers=3, hidden=192,
        use_pallas=True, interpret=True, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=4e-4, atol=4e-4)


def test_vocoder_pallas_wn_path_matches_module(tmp_path):
    """Vocoder(use_pallas_wn=True) routes prior+flow through the fused kernel
    (interpret mode on CPU) and matches the module-graph Vocoder."""
    import json
    import os

    from smart_vocoder_tpu.config import load_config
    from smart_vocoder_tpu.inference import Vocoder
    from smart_vocoder_tpu.models import build_synthesizer

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
            # hidden 192 so the WN kernel's 128-lane row packing applies
            "inter_channels": 192, "hidden_channels": 192, "resblock": "1",
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3, 5]],
            "upsample_rates": [8, 8, 2, 2], "upsample_initial_channel": 32,
            "upsample_kernel_sizes": [16, 16, 4, 4], "use_spectral_norm": False,
            "gin_channels": 0, "enc_layers": 2, "flow_wn_layers": 2,
        },
    }
    path = os.path.join(str(tmp_path), "cfg.json")
    with open(path, "w") as f:
        json.dump(cfg, f)
    hps = load_config(path)
    net = build_synthesizer(hps)
    t = 64
    mel0 = jnp.zeros((1, t, 80))
    spec = jnp.zeros((1, t, 513))
    lens = jnp.full((1,), t, jnp.int32)
    params = net.init(jax.random.key(0), mel0, lens, spec, lens,
                      jax.random.key(1))["params"]

    voc_ref = Vocoder(hps, params, dtype=jnp.float32, buckets=(64,),
                      use_pallas_wn=False)
    voc_wn = Vocoder(hps, params, dtype=jnp.float32, buckets=(64,),
                     use_pallas_wn=True)
    assert voc_wn.use_pallas_wn and not voc_ref.use_pallas_wn

    rng = np.random.default_rng(2)
    mel = rng.normal(-4, 2, size=(1, 48, 80)).astype(np.float32)
    eps = rng.normal(size=(1, 64, 192)).astype(np.float32)
    want = voc_ref.mel_to_wav(mel, np.array([48]), eps=eps[:, :48])[0]
    got = voc_wn.mel_to_wav(mel, np.array([48]), eps=eps[:, :48])[0]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
