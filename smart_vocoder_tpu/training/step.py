"""The jitted GAN train step (reference train.py:123-213, as one XLA program).

One step = both GAN phases, mirroring the reference's semantics and order:

  1. generator forward (posterior -> flow -> random 32-frame slice -> decode)
     -- computed ONCE via ``jax.vjp`` and shared by both phases, exactly like
     the reference's single ``y_hat`` reused at train.py:150/:185/:200
  2. NDA jigsaw negative: permute 4 chunks of the real slice, mix
     ``0.75*y_hat + 0.25*y_jigsaw`` (train.py:168-181 -- the repo's main
     training-loop novelty, kept exactly)
  3. D update on (y, stop_gradient(y_negative))                (train.py:185-196)
  4. G update through the *updated* D on (y, y_hat)            (train.py:198-213)
     with composite loss gen + fm + c_mel*melL1 + c_kl*KL      (train.py:202-207)

The G gradient is assembled as loss-grad w.r.t. the generator *outputs*
(y_hat, z_p, m_p, logs_p, logs_q) pulled back through the saved forward's
vjp -- one generator forward + one generator backward per step, no re-forward
inside the loss closure.

When the discriminator uses spectral norm (use_spectral_norm=true,
models.py:175/:210), the power-iteration vectors live in the mutable
``spectral`` collection carried on TrainState; both D applies run with
``mutable=['spectral']`` so ``weight_u`` advances every forward like torch's
spectral_norm pre-forward hook.

Losses are float32 islands regardless of compute dtype (train.py:189, :201).
The reference's ``clip_grad_value_(params, None)`` never clips with the
config of record -- it only measures the global grad norm for logging
(commons.py:146-161); same here by default. Setting
``train.clip_grad_value`` enables the reference's elementwise clamp
(norm still logged pre-clip, matching commons.py's accumulate-then-clamp
order).

Randomness is explicit: one step key is split into posterior-noise, slice, and
jigsaw keys (the reference relies on unseeded global torch RNG,
commons.py:62, train.py:171).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from smart_vocoder_tpu import losses as losses_lib
from smart_vocoder_tpu.ops import MelConfig, mel_spectrogram, slice_segments, spec_to_mel


@flax.struct.dataclass
class Batch:
    """One padded, static-shape training batch (see data/pipeline.py)."""

    spec: jnp.ndarray          # (B, T, n_fft//2+1) float32
    spec_lengths: jnp.ndarray  # (B,) int32
    wav: jnp.ndarray           # (B, T*hop, 1) float32
    wav_lengths: jnp.ndarray   # (B,) int32
    sid: Optional[jnp.ndarray] = None  # (B,) int32 speaker ids (ms configs)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params_g: Any
    params_d: Any
    opt_g: optax.OptState
    opt_d: optax.OptState
    # Power-iteration u vectors for spectral-normed discriminators; an empty
    # dict when use_spectral_norm=false (both shipped configs).
    spectral_d: Any = flax.struct.field(default_factory=dict)


def _nda_jigsaw(rng: jax.Array, y: jnp.ndarray, y_hat: jnp.ndarray) -> jnp.ndarray:
    """Jigsaw negative (train.py:168-181): one shared randperm of 4 time
    chunks; identity permutation falls back to y_hat."""
    b, seg, _ = y.shape
    perm = jax.random.permutation(rng, 4)
    y_jig = y.reshape(b, 4, seg // 4, 1)[:, perm].reshape(b, seg, 1)
    is_identity = jnp.all(perm == jnp.arange(4))
    y_jigsaw = jnp.where(is_identity, y_hat, y_jig)
    return 0.75 * y_hat + 0.25 * y_jigsaw


def make_train_step(
    hps,
    g_module,
    d_module,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    donate: bool = True,
    emit_images: bool = True,
):
    """Build the jitted train step closure over static config + modules.

    ``emit_images`` gates the three ``image/*`` metrics. They are slices of
    tensors the step computes anyway (y_mel / y_hat_mel feed the mel loss),
    but as step OUTPUTS they are materialized and cross-device-replicated
    every step (~92 KB/step at B=16x1000), not only at log_interval -- the
    lazy part is just the host fetch. Kept ON by default (reference TB parity,
    train.py:230-239); benches and dryruns can turn it off.
    """
    mel_cfg = MelConfig.from_hparams(hps)
    hop = hps.data.hop_length
    seg_frames = hps.train.segment_size // hop
    seg_samples = hps.train.segment_size
    c_mel = float(hps.train.c_mel)
    c_kl = float(hps.train.c_kl)
    use_sn = bool(hps.model.get("use_spectral_norm", False))
    # Optional elementwise grad clamp (reference commons.py:146-161
    # clip_grad_value_; the config of record passes None so it never clips,
    # but the capability exists -- parity knob). Reference semantics: the
    # logged norm is measured BEFORE clamping.
    clip_val = hps.train.get("clip_grad_value", None)
    clip_val = float(clip_val) if clip_val is not None else None

    def _clip(grads):
        if clip_val is None:
            return grads
        return jax.tree.map(lambda g: jnp.clip(g, -clip_val, clip_val), grads)

    def d_apply(params_d, spectral_d, y, y_hat):
        """Discriminator forward; advances power-iteration state when SN is on.

        Returns (y_d_r, y_d_g, fmap_r, fmap_g, new_spectral)."""
        if use_sn:
            outs, mut = d_module.apply(
                {"params": params_d, "spectral": spectral_d}, y, y_hat,
                mutable=["spectral"],
            )
            return (*outs, mut["spectral"])
        outs = d_module.apply({"params": params_d}, y, y_hat)
        return (*outs, spectral_d)

    def train_step(state: TrainState, batch: Batch, rng: jax.Array):
        rng_g, rng_nda = jax.random.split(rng)
        mel = spec_to_mel(batch.spec, mel_cfg)

        # ---- ONE generator forward, vjp saved for the G phase ---------------
        # (the reference computes y_hat once and reuses it, train.py:150)
        def g_outputs(params_g):
            y_hat, ids_slice, x_mask, z_mask, (z, z_p, m_p, logs_p, m_q, logs_q) = (
                g_module.apply(
                    {"params": params_g}, mel, batch.spec_lengths, batch.spec,
                    batch.spec_lengths, rng_g, sid=batch.sid,
                )
            )
            return (y_hat, z_p, m_p, logs_p, logs_q), (ids_slice, z_mask)

        g_out, g_vjp, (ids_slice, z_mask) = jax.vjp(
            g_outputs, state.params_g, has_aux=True
        )
        y_hat = g_out[0]

        y_mel = slice_segments(mel, ids_slice, seg_frames)
        y = slice_segments(batch.wav, ids_slice * hop, seg_samples)
        y_negative = _nda_jigsaw(rng_nda, y, y_hat)
        y_negative = jax.lax.stop_gradient(y_negative)  # train.py:185 .detach()

        # ---- discriminator phase (train.py:184-196) -------------------------
        def loss_d_fn(params_d):
            y_d_hat_r, y_d_hat_g, _, _, spectral_new = d_apply(
                params_d, state.spectral_d, y, y_negative
            )
            loss_disc, losses_disc_r, losses_disc_g = losses_lib.discriminator_loss(
                y_d_hat_r, y_d_hat_g
            )
            return loss_disc, (losses_disc_r, losses_disc_g, spectral_new)

        (loss_disc, (losses_disc_r, losses_disc_g, spectral_d)), grads_d = (
            jax.value_and_grad(loss_d_fn, has_aux=True)(state.params_d)
        )
        grad_norm_d = optax.global_norm(grads_d)
        grads_d = _clip(grads_d)
        updates_d, opt_d = tx_d.update(grads_d, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, updates_d)

        # ---- generator phase, through the UPDATED discriminator -------------
        # (reference steps optim_d before re-running net_d(y, y_hat),
        # train.py:196-200). Loss is a function of the saved generator
        # OUTPUTS; the cotangents pull back through g_vjp -- no second G
        # forward.
        def loss_from_outputs(g_out):
            y_hat_g, z_p_g, m_p_g, logs_p_g, logs_q_g = g_out
            y_hat_mel = mel_spectrogram(y_hat_g[..., 0].astype(jnp.float32), mel_cfg)

            y_d_hat_r, y_d_hat_g, fmap_r, fmap_g, spectral_new = d_apply(
                params_d, spectral_d, y, y_hat_g
            )
            loss_mel = losses_lib.mel_l1_loss(y_mel, y_hat_mel) * c_mel
            loss_kl = losses_lib.kl_loss(z_p_g, logs_q_g, m_p_g, logs_p_g, z_mask) * c_kl
            fmap_r = jax.lax.stop_gradient(fmap_r)  # losses.py:11 .detach()
            loss_fm = losses_lib.feature_loss(fmap_r, fmap_g)
            loss_gen, losses_gen = losses_lib.generator_loss(y_d_hat_g)
            loss_gen_all = loss_gen + loss_fm + loss_mel + loss_kl
            return loss_gen_all, (loss_gen, losses_gen, loss_fm, loss_mel,
                                  loss_kl, spectral_new, y_hat_mel)

        (loss_gen_all, (loss_gen, losses_gen, loss_fm, loss_mel, loss_kl,
                        spectral_d, y_hat_mel)), cotangents = (
            jax.value_and_grad(loss_from_outputs, has_aux=True)(g_out)
        )
        (grads_g,) = g_vjp(cotangents)
        grad_norm_g = optax.global_norm(grads_g)
        grads_g = _clip(grads_g)
        updates_g, opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates_g)

        new_state = TrainState(
            step=state.step + 1,
            params_g=params_g,
            params_d=params_d,
            opt_g=opt_g,
            opt_d=opt_d,
            spectral_d=spectral_d,
        )

        # Scalar names match the reference TB dashboard (train.py:224-229).
        metrics: Dict[str, jnp.ndarray] = {
            "loss/g/total": loss_gen_all,
            "loss/d/total": loss_disc,
            "loss/g/fm": loss_fm,
            "loss/g/mel": loss_mel,
            "loss/g/kl": loss_kl,
            "grad_norm_d": grad_norm_d,
            "grad_norm_g": grad_norm_g,
        }
        for i, v in enumerate(losses_gen):
            metrics[f"loss/g/{i}"] = v
        for i, v in enumerate(losses_disc_r):
            metrics[f"loss/d_r/{i}"] = v
        for i, v in enumerate(losses_disc_g):
            metrics[f"loss/d_g/{i}"] = v
        # Training-health mel images (first batch element), logged by the loop
        # every log_interval under the reference's TB names (train.py:230-239).
        if emit_images:
            metrics["image/slice_mel_org"] = y_mel[0].astype(jnp.float32)
            metrics["image/slice_mel_gen"] = y_hat_mel[0].astype(jnp.float32)
            metrics["image/all_mel"] = mel[0].astype(jnp.float32)
        return new_state, metrics

    return train_step


def init_train_state(hps, g_module, d_module, tx_g, tx_d, rng: jax.Array,
                     batch: Batch) -> TrainState:
    """Initialize params + optimizer states from one example batch."""
    rng_g, rng_d, rng_noise = jax.random.split(rng, 3)
    mel_cfg = MelConfig.from_hparams(hps)
    mel = spec_to_mel(batch.spec, mel_cfg)
    params_g = g_module.init(
        rng_g, mel, batch.spec_lengths, batch.spec, batch.spec_lengths,
        rng_noise, sid=batch.sid,
    )["params"]
    seg = jnp.zeros((batch.wav.shape[0], hps.train.segment_size, 1), batch.wav.dtype)
    vars_d = d_module.init(rng_d, seg, seg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d=vars_d["params"],
        opt_g=tx_g.init(params_g),
        opt_d=tx_d.init(vars_d["params"]),
        spectral_d=vars_d.get("spectral", {}),
    )
