"""Committed-fixture fidelity: parity proof that outlives the reference mount.

tests/fixtures/golden_iitp_base.npz stores the torch reference's f32 waveform
for a pinned (weights, mel, noise) triple (scripts/make_golden.py). This test
regenerates the weights from the shared recipe (utils/golden.py), synthesizes
through the module graph at matmul precision "highest" (DEFAULT computes f32
matmuls at bf16-class accuracy on this stack), and checks the BASELINE
fidelity target mel-L1 <= 1e-2 -- with no torch and no /root/reference needed.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.models import build_synthesizer
from smart_vocoder_tpu.models.synthesizer import SynthesizerTrn
from smart_vocoder_tpu.ops import MelConfig, mel_spectrogram
from smart_vocoder_tpu.utils.golden import fidelity_params

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_FIXTURE = os.path.join(_REPO, "tests", "fixtures", "golden_iitp_base.npz")


@pytest.mark.skipif(not os.path.exists(_FIXTURE), reason="fixture not built")
def test_golden_fixture_mel_l1():
    hps = load_config(os.path.join(_REPO, "configs", "iitp_base.json"))
    gz = np.load(_FIXTURE)
    gmel = jnp.asarray(gz["mel"])
    lens = jnp.full((1,), gmel.shape[1], jnp.int32)
    spec = jnp.zeros((1, gmel.shape[1], hps.data.filter_length // 2 + 1))
    params = fidelity_params(hps, gmel, lens, spec)

    net = build_synthesizer(hps, weight_norm=False)
    mel_cfg = MelConfig.from_hparams(hps)

    @jax.jit
    def fid(params, gmel, glens, geps, gwav):
        wav, _, _ = net.apply(
            {"params": params}, gmel, glens, jax.random.key(0),
            noise_scale=float(gz["noise_scale"]), eps=geps,
            method=SynthesizerTrn.infer,
        )
        m_got = mel_spectrogram(wav[..., 0].astype(jnp.float32), mel_cfg)
        m_ref = mel_spectrogram(gwav[None].astype(jnp.float32), mel_cfg)
        return jnp.mean(jnp.abs(m_got - m_ref))

    with jax.default_matmul_precision("highest"):
        l1 = float(fid(params, gmel, lens, jnp.asarray(gz["eps"]),
                       jnp.asarray(gz["wav_ref"])))
    assert l1 <= 1e-2, l1
