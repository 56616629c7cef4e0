"""Spectral-norm conv parity vs torch.nn.utils.spectral_norm (the
use_spectral_norm discriminator path, reference models.py:175)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from smart_vocoder_tpu.models import MultiPeriodDiscriminator
from smart_vocoder_tpu.nn import NormConv1d


class TestSpectralNorm:
    def test_matches_torch_power_iteration_trajectory(self):
        """Track outputs AND the u buffer across several train-mode forwards;
        each step must match torch's (the estimate is far from converged early
        on, so any iteration-count mismatch shows up immediately)."""
        torch.manual_seed(0)
        tconv = torch.nn.utils.spectral_norm(torch.nn.Conv1d(8, 16, 5, padding=2))
        x = torch.randn(2, 8, 32)

        mod = NormConv1d(16, 5, padding=2, weight_norm=False, spectral_norm=True)
        xm = jnp.asarray(x.numpy().transpose(0, 2, 1))
        variables = mod.init(jax.random.key(0), xm)
        params = variables["params"]
        # np.array copies are essential: torch updates weight_u IN PLACE during
        # forward, and jnp.asarray of a torch-backed numpy view can alias it.
        params["weight_orig"] = jnp.asarray(np.array(tconv.weight_orig.detach().numpy()))
        params["bias"] = jnp.asarray(np.array(tconv.bias.detach().numpy()))
        spectral = {"weight_u": jnp.asarray(np.array(tconv.weight_u.detach().numpy()))}

        tconv.train()
        for step in range(5):
            want = tconv(x).detach().numpy()
            got, mutated = mod.apply(
                {"params": params, "spectral": spectral}, xm, mutable=["spectral"]
            )
            spectral = mutated["spectral"]
            np.testing.assert_allclose(
                np.asarray(got).transpose(0, 2, 1), want, rtol=1e-3, atol=1e-2,
                err_msg=f"step {step} output",
            )
            np.testing.assert_allclose(
                np.asarray(spectral["weight_u"]),
                np.array(tconv.weight_u.detach().numpy()),
                rtol=1e-3, atol=1e-3, err_msg=f"step {step} u",
            )

    def test_readonly_apply_does_not_mutate(self):
        mod = NormConv1d(4, 3, padding=1, weight_norm=False, spectral_norm=True)
        x = jnp.ones((1, 16, 4))
        variables = mod.init(jax.random.key(1), x)
        y = mod.apply(variables, x)  # no mutable: eval mode
        assert y.shape == (1, 16, 4)

    def test_mpd_with_spectral_norm_builds_and_runs(self):
        mpd = MultiPeriodDiscriminator(use_spectral_norm=True, width_mult=0.125)
        y = jax.random.normal(jax.random.key(2), (1, 2048, 1)) * 0.3
        variables = mpd.init(jax.random.key(3), y, y)
        assert "spectral" in variables
        (logits_r, logits_g, fr, fg), mutated = mpd.apply(
            variables, y, y, mutable=["spectral"]
        )
        assert len(logits_r) == 6
        for l in logits_r:
            assert bool(jnp.all(jnp.isfinite(l)))
