"""Voice conversion path (models.py:341-349 -- broken in the reference because
emb_g was never defined; functional here with use_spk_embed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_vocoder_tpu.models import SynthesizerTrn
from smart_vocoder_tpu.models.synthesizer import SynthesizerTrn as S


@pytest.fixture(scope="module")
def net_and_params():
    net = SynthesizerTrn(
        spec_channels=513, segment_size=8, inter_channels=32, hidden_channels=32,
        resblock="2", resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        upsample_rates=(8, 8, 2, 2), upsample_initial_channel=32,
        upsample_kernel_sizes=(16, 16, 4, 4), n_speakers=5, gin_channels=16,
        use_spk_embed=True, enc_layers=2, flow_wn_layers=2,
    )
    t = 24
    mel = jnp.zeros((1, t, 80))
    spec = jnp.zeros((1, t, 513))
    lens = jnp.full((1,), t, jnp.int32)
    params = net.init(jax.random.key(0), mel, lens, spec, lens, jax.random.key(1),
                      sid=jnp.array([0]))["params"]
    return net, params


class TestVoiceConversion:
    def test_shapes_and_finite(self, net_and_params):
        net, params = net_and_params
        spec = jax.random.uniform(jax.random.key(2), (2, 24, 513)) * 2
        lens = jnp.array([24, 20])
        o, mask, (z, z_p, z_hat) = net.apply(
            {"params": params}, spec, lens, jax.random.key(3),
            jnp.array([1, 2]), jnp.array([3, 4]), method=S.voice_conversion,
        )
        assert o.shape == (2, 24 * 256, 1)
        assert z.shape == z_p.shape == z_hat.shape == (2, 24, 32)
        assert bool(jnp.all(jnp.isfinite(o)))

    def test_same_speaker_is_identity_through_flow(self, net_and_params):
        """flow followed by its inverse with the same g recovers z exactly."""
        net, params = net_and_params
        spec = jax.random.uniform(jax.random.key(4), (1, 24, 513)) * 2
        lens = jnp.array([24])
        _, _, (z, z_p, z_hat) = net.apply(
            {"params": params}, spec, lens, jax.random.key(5),
            jnp.array([2]), jnp.array([2]), method=S.voice_conversion,
        )
        np.testing.assert_allclose(np.asarray(z_hat), np.asarray(z), rtol=1e-4, atol=1e-5)

    def test_speaker_embedding_changes_output(self, net_and_params):
        net, params = net_and_params
        spec = jax.random.uniform(jax.random.key(6), (1, 24, 513)) * 2
        lens = jnp.array([24])
        outs = []
        for tgt in (1, 3):
            o, _, _ = net.apply(
                {"params": params}, spec, lens, jax.random.key(7),
                jnp.array([0]), jnp.array([tgt]), method=S.voice_conversion,
            )
            outs.append(np.asarray(o))
        assert not np.allclose(outs[0], outs[1])

    def test_requires_spk_embed(self):
        net = SynthesizerTrn(
            spec_channels=513, segment_size=8, inter_channels=32, hidden_channels=32,
            resblock="2", resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
            upsample_rates=(8, 8, 2, 2), upsample_initial_channel=32,
            upsample_kernel_sizes=(16, 16, 4, 4), n_speakers=0, gin_channels=0,
            enc_layers=1, flow_wn_layers=1,
        )
        spec = jnp.zeros((1, 24, 513))
        lens = jnp.array([24])
        with pytest.raises(AssertionError, match="use_spk_embed"):
            net.init(jax.random.key(0), spec, lens, jax.random.key(1),
                     jnp.array([0]), jnp.array([1]), method=S.voice_conversion)
