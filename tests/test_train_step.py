"""Integration tests for the jitted GAN train step (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from smart_vocoder_tpu.config import HParams, validate
from smart_vocoder_tpu.models import MultiPeriodDiscriminator, SynthesizerTrn
from smart_vocoder_tpu.training import (
    Batch,
    lr_for_epoch,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)
from smart_vocoder_tpu.training.step import init_train_state


def tiny_hps() -> HParams:
    return validate(HParams(
        train=dict(
            log_interval=10, eval_interval=100, seed=1234, epochs=3,
            learning_rate=2e-4, betas=[0.8, 0.99], eps=1e-9, batch_size=2,
            fp16_run=False, lr_decay=0.999875, segment_size=2048,
            c_mel=45, c_kl=1.0,
        ),
        data=dict(
            training_files="", validation_files="", max_wav_value=32768.0,
            sampling_rate=22050, filter_length=1024, hop_length=256,
            win_length=1024, n_mel_channels=80, mel_fmin=0.0, mel_fmax=None,
            add_blank=True, n_speakers=4,
        ),
        model=dict(
            inter_channels=32, hidden_channels=32, resblock="1",
            resblock_kernel_sizes=[3, 7], resblock_dilation_sizes=[[1, 3], [1, 3]],
            upsample_rates=[8, 8, 2, 2], upsample_initial_channel=64,
            upsample_kernel_sizes=[16, 16, 4, 4], gin_channels=16,
            use_spectral_norm=False, use_spk_embed=True,
        ),
    ))


def tiny_models(hps):
    g = SynthesizerTrn(
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
        use_spk_embed=True,
        enc_layers=2,
        flow_wn_layers=2,
    )
    d = MultiPeriodDiscriminator(width_mult=0.125)
    return g, d


def synthetic_batch(hps, t_frames=32, batch=2, seed=0) -> Batch:
    rng = np.random.default_rng(seed)
    hop = hps.data.hop_length
    wav = rng.uniform(-0.5, 0.5, size=(batch, t_frames * hop, 1)).astype(np.float32)
    from smart_vocoder_tpu.ops import stft_magnitude

    spec = np.asarray(stft_magnitude(
        jnp.asarray(wav[..., 0]), hps.data.filter_length, hop, hps.data.win_length
    ))
    return Batch(
        spec=jnp.asarray(spec),
        spec_lengths=jnp.full((batch,), t_frames, jnp.int32),
        wav=jnp.asarray(wav),
        wav_lengths=jnp.full((batch,), t_frames * hop, jnp.int32),
        # wrap into the valid speaker range -- out-of-range ids make jnp.take
        # fill NaN (torch would device-assert instead)
        sid=jnp.arange(batch, dtype=jnp.int32) % hps.data.n_speakers,
    )


@pytest.fixture(scope="module")
def setup():
    hps = tiny_hps()
    g, d = tiny_models(hps)
    tx_g, tx_d = make_optimizer(hps), make_optimizer(hps)
    batch = synthetic_batch(hps)
    state = init_train_state(hps, g, d, tx_g, tx_d, jax.random.key(0), batch)
    step_fn = jax.jit(make_train_step(hps, g, d, tx_g, tx_d))
    return hps, state, step_fn, batch


class TestTrainStep:
    def test_single_step_metrics_finite(self, setup):
        hps, state, step_fn, batch = setup
        new_state, metrics = step_fn(state, batch, jax.random.key(1))
        assert int(new_state.step) == int(state.step) + 1
        expected = {"loss/g/total", "loss/d/total", "loss/g/fm", "loss/g/mel",
                    "loss/g/kl", "grad_norm_d", "grad_norm_g"}
        assert expected <= set(metrics)
        # per-discriminator scalars: 6 discriminators
        assert sum(k.startswith("loss/d_r/") for k in metrics) == 6
        # training-health mel images for the TB dashboard (train.py:230-239)
        seg_frames = hps.train.segment_size // hps.data.hop_length
        assert metrics["image/slice_mel_org"].shape == (seg_frames, 80)
        assert metrics["image/slice_mel_gen"].shape == (seg_frames, 80)
        assert metrics["image/all_mel"].shape[-1] == 80
        for k, v in metrics.items():
            assert np.all(np.isfinite(np.asarray(v))), f"{k} not finite"
        assert float(metrics["grad_norm_g"]) > 0
        assert float(metrics["grad_norm_d"]) > 0

    def test_params_update(self, setup):
        hps, state, step_fn, batch = setup
        # Two steps: the zero-initialized coupling `post` convs block upstream
        # flow gradients at step 0 (identity flow); they open up at step 1.
        mid, _ = step_fn(state, batch, jax.random.key(2))
        new_state, _ = step_fn(mid, batch, jax.random.key(3))
        leaves_before = jax.tree.leaves(state.params_g)
        leaves_after = jax.tree.leaves(new_state.params_g)
        changed = sum(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(leaves_before, leaves_after)
        )
        assert changed == len(leaves_before), f"{changed}/{len(leaves_before)}"

    def test_mel_loss_decreases_on_overfit(self, setup):
        hps, state, step_fn, batch = setup
        first = last = None
        for i in range(12):
            state, metrics = step_fn(state, batch, jax.random.key(100))  # fixed rng: same slice
            if first is None:
                first = float(metrics["loss/g/mel"])
            last = float(metrics["loss/g/mel"])
        assert last < first, (first, last)

    def test_lr_schedule(self, setup):
        hps, state, step_fn, batch = setup
        assert lr_for_epoch(hps, 1) == pytest.approx(2e-4)
        assert lr_for_epoch(hps, 2) == pytest.approx(2e-4 * 0.999875)
        opt = set_learning_rate(state.opt_g, lr_for_epoch(hps, 5))
        assert float(opt.hyperparams["learning_rate"]) == pytest.approx(2e-4 * 0.999875**4)


class TestSpectralNormTraining:
    """use_spectral_norm=true trains: the 'spectral' collection (power-
    iteration u vectors) is carried on TrainState and advances every step
    (VERDICT round-1 missing #4 / ADVICE medium)."""

    def test_sn_step_updates_weight_u_and_stays_finite(self):
        hps = tiny_hps()
        hps.model.use_spectral_norm = True
        g, _ = tiny_models(hps)
        d = MultiPeriodDiscriminator(use_spectral_norm=True, width_mult=0.125)
        tx_g, tx_d = make_optimizer(hps), make_optimizer(hps)
        batch = synthetic_batch(hps)
        state = init_train_state(hps, g, d, tx_g, tx_d, jax.random.key(0), batch)
        u_leaves = jax.tree.leaves(state.spectral_d)
        assert u_leaves, "spectral collection missing from TrainState"

        step_fn = jax.jit(make_train_step(hps, g, d, tx_g, tx_d))
        s1, m1 = step_fn(state, batch, jax.random.key(1))
        s2, m2 = step_fn(s1, batch, jax.random.key(2))
        for k, v in m2.items():
            assert np.all(np.isfinite(np.asarray(v))), k
        # every multi-dim u vector advanced across steps (torch pre-forward
        # hook parity); conv_post u's have dim 1 where +-1 is a fixed point
        before, after = jax.tree.leaves(s1.spectral_d), jax.tree.leaves(s2.spectral_d)
        multi = [(a, b) for a, b in zip(before, after) if a.size > 1]
        changed = sum(not np.array_equal(np.asarray(a), np.asarray(b))
                      for a, b in multi)
        assert changed == len(multi), f"{changed}/{len(multi)} u vectors moved"
        # and D params actually update under SN
        moved = sum(not np.array_equal(np.asarray(a), np.asarray(b))
                    for a, b in zip(jax.tree.leaves(state.params_d),
                                    jax.tree.leaves(s2.params_d)))
        assert moved == len(jax.tree.leaves(state.params_d))


class TestGradClip:
    """train.clip_grad_value enables the reference's elementwise clamp
    (commons.py:146-161); default None reproduces the norm-only behaviour."""

    def test_clip_changes_update_but_not_logged_norm(self):
        hps = tiny_hps()
        g, d = tiny_models(hps)
        tx_g, tx_d = make_optimizer(hps), make_optimizer(hps)
        batch = synthetic_batch(hps)
        state = init_train_state(hps, g, d, tx_g, tx_d, jax.random.key(0), batch)

        step_plain = jax.jit(make_train_step(hps, g, d, tx_g, tx_d))
        hps_clip = tiny_hps()
        hps_clip.train.clip_grad_value = 1e-5  # far below typical |g| at init
        step_clip = jax.jit(make_train_step(hps_clip, g, d, tx_g, tx_d))

        s_a, m_a = step_plain(state, batch, jax.random.key(1))
        s_b, m_b = step_clip(state, batch, jax.random.key(1))
        # the logged norm is measured BEFORE clamping -> identical
        np.testing.assert_allclose(float(m_a["grad_norm_g"]),
                                   float(m_b["grad_norm_g"]), rtol=1e-6)
        np.testing.assert_allclose(float(m_a["grad_norm_d"]),
                                   float(m_b["grad_norm_d"]), rtol=1e-6)
        # but the applied updates differ (clamp engaged)
        a, b = jax.tree.leaves(s_a.params_g), jax.tree.leaves(s_b.params_g)
        assert any(not np.array_equal(np.asarray(x), np.asarray(y))
                   for x, y in zip(a, b))
