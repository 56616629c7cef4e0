"""Multi-device tests on the virtual 8-device CPU mesh.

Validates that the full GAN train step compiles and executes under pjit with
data-parallel (and data+model) shardings, and that data parallelism is
numerically equivalent to single-device execution on the same global batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_vocoder_tpu.parallel import make_mesh, shard_batch
from smart_vocoder_tpu.parallel.mesh import jit_train_step, state_shardings
from smart_vocoder_tpu.training import make_optimizer, make_train_step
from smart_vocoder_tpu.training.step import init_train_state

from test_train_step import synthetic_batch, tiny_hps, tiny_models


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual CPU devices"
    hps = tiny_hps()
    g, d = tiny_models(hps)
    tx_g, tx_d = make_optimizer(hps), make_optimizer(hps)
    batch = synthetic_batch(hps, batch=8)
    state = init_train_state(hps, g, d, tx_g, tx_d, jax.random.key(0), batch)
    step_fn = make_train_step(hps, g, d, tx_g, tx_d)
    return hps, g, d, state, step_fn, batch


class TestDataParallel:
    def test_dp8_matches_single_device(self, setup):
        """8-way DP compiles, runs, and matches single-device numerics on the
        same global batch + rng (up to f32 reduction order)."""
        hps, g, d, state, step_fn, batch = setup
        rng = jax.random.key(42)

        _, metrics_1 = jax.jit(step_fn)(state, batch, rng)

        mesh = make_mesh(data=8, model=1)
        sharded_state = jax.device_put(state, state_shardings(mesh, state))
        sharded_batch = shard_batch(mesh, batch)
        fn = jit_train_step(step_fn, mesh, state, donate=False)
        new_state, metrics_8 = fn(sharded_state, sharded_batch, rng)
        jax.block_until_ready(new_state)

        for k, v in metrics_8.items():
            assert np.all(np.isfinite(np.asarray(v))), k
        for k in ("loss/g/total", "loss/d/total", "loss/g/mel", "loss/g/kl"):
            a, b = float(metrics_1[k]), float(metrics_8[k])
            assert abs(a - b) / max(abs(a), 1e-6) < 5e-3, (k, a, b)

    def test_dp4_model2_mesh(self, setup):
        """2-D mesh (4 data x 2 model) compiles and runs the full step."""
        hps, g, d, state, step_fn, batch = setup
        mesh = make_mesh(data=4, model=2)
        sharded_state = jax.device_put(state, state_shardings(mesh, state))
        sharded_batch = shard_batch(mesh, batch)
        fn = jit_train_step(step_fn, mesh, state, donate=False)
        new_state, metrics = fn(sharded_state, sharded_batch, jax.random.key(2))
        jax.block_until_ready(new_state)
        assert np.isfinite(float(metrics["loss/g/total"]))


class TestInferenceSharding:
    def test_batched_infer_dp(self, setup):
        hps, g, d, state, step_fn, batch = setup
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(data=8, model=1)
        mel = jnp.zeros((8, 64, 80))
        lens = jnp.full((8,), 64, jnp.int32)

        def infer(params, mel, lens, rng):
            return g.apply({"params": params}, mel, lens, rng, noise_scale=0.667,
                           method=type(g).infer)[0]

        fn = jax.jit(
            infer,
            in_shardings=(
                state_shardings(mesh, state.params_g),
                NamedSharding(mesh, P("data")),
                NamedSharding(mesh, P("data")),
                NamedSharding(mesh, P()),
            ),
        )
        params = jax.device_put(state.params_g, state_shardings(mesh, state.params_g))
        out = fn(params, jax.device_put(mel, NamedSharding(mesh, P("data"))),
                 jax.device_put(lens, NamedSharding(mesh, P("data"))), jax.random.key(0))
        assert out.shape == (8, 64 * 256, 1)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestDataParallelServing:
    def test_vocoder_dp8_matches_single_device(self, tmp_path):
        """Vocoder(mesh=...) shards the batch over the data axis and matches
        the single-device path bitwise-ish on the same inputs + pinned eps,
        including a non-tiling batch (padded up to the axis size)."""
        import sys

        sys.path.insert(0, "tests")
        from test_inference_api import tiny_vocoder

        from smart_vocoder_tpu.inference import Vocoder

        hps, params = tiny_vocoder(tmp_path)
        voc1 = Vocoder(hps, params, dtype=jnp.float32, buckets=(64,))
        mesh = make_mesh(data=8, model=1)
        voc8 = Vocoder(hps, params, dtype=jnp.float32, buckets=(64,), mesh=mesh)

        rng = np.random.default_rng(3)
        for b in (8, 5):  # exact tile + padded batch
            mel = rng.normal(-4, 2, size=(b, 50, 80)).astype(np.float32)
            lengths = np.arange(40, 40 + b)
            eps = rng.normal(size=(b, 64, hps.model.inter_channels)).astype(np.float32)
            want = voc1.mel_to_wav(mel, lengths, eps=eps)
            got = voc8.mel_to_wav(mel, lengths, eps=eps)
            assert len(got) == b
            for w, g_ in zip(want, got):
                np.testing.assert_allclose(g_, w, rtol=2e-5, atol=2e-5)

        # seed-pinned noise is topology-independent: same seed with NO explicit
        # eps gives the same audio on mesh=None and the 8-way mesh, including a
        # padded (non-tiling) batch -- _batch_eps derives noise per global
        # batch element, never from the shard index.
        mel = rng.normal(-4, 2, size=(5, 50, 80)).astype(np.float32)
        lengths = np.arange(40, 45)
        want = voc1.mel_to_wav(mel, lengths, seed=11)
        got = voc8.mel_to_wav(mel, lengths, seed=11)
        for w, g_ in zip(want, got):
            np.testing.assert_allclose(g_, w, rtol=2e-5, atol=2e-5)
