"""The training loop (L7): the TPU-native counterpart of train.py:52-310.

Differences from the reference runtime, by design:
  - no mp.spawn / process-per-device: one process drives all local devices
    through pjit over the ('data','model') mesh; multi-host runs shard the
    dataset by jax.process_index() (the DistributedBucketSampler rank axis).
  - bf16 compute replaces fp16 AMP + GradScaler (no loss scaling needed on TPU).
  - checkpoints are atomic orbax pytrees carrying G, D, both optimizer states,
    step and epoch together (reference splits G_/D_ and reconstructs step from
    epoch, train.py:104).

Logging cadence, scalar names, and LR schedule match the reference exactly.
Eval keeps the reference's max_len=1000 crop and TB surface but scores
``eval/mel_l1`` over a fixed ``tpu.eval_samples`` (default 8) utterance set
instead of the reference's single first sample (train.py:261-265).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from smart_vocoder_tpu.data import AudioSpecDataset, BucketSampler, BucketedLoader
from smart_vocoder_tpu.models import MultiPeriodDiscriminator, build_synthesizer
from smart_vocoder_tpu.models.synthesizer import SynthesizerTrn
from smart_vocoder_tpu.ops import MelConfig, mel_spectrogram, spec_to_mel
from smart_vocoder_tpu.parallel import make_mesh, shard_batch
from smart_vocoder_tpu.parallel.mesh import jit_train_step, state_shardings
from smart_vocoder_tpu.training.optim import lr_for_epoch, make_optimizer, set_learning_rate
from smart_vocoder_tpu.training.step import Batch, init_train_state, make_train_step
from smart_vocoder_tpu.utils import checkpoint as ckpt_lib
from smart_vocoder_tpu.utils import logging_utils
from smart_vocoder_tpu.utils.profiling import StepProfiler, StepTimer


def _synthetic_init_batch(hps, batch_size: int) -> Batch:
    """A minimal static batch for parameter initialization."""
    frames = max(64, hps.train.segment_size // hps.data.hop_length * 2)
    n_bins = hps.data.filter_length // 2 + 1
    hop = hps.data.hop_length
    sid = jnp.zeros((batch_size,), jnp.int32) if hps.data.n_speakers > 0 else None
    if not bool(hps.model.get("use_spk_embed", False)):
        sid = None
    return Batch(
        spec=jnp.zeros((batch_size, frames, n_bins), jnp.float32),
        spec_lengths=jnp.full((batch_size,), frames, jnp.int32),
        wav=jnp.zeros((batch_size, frames * hop, 1), jnp.float32),
        wav_lengths=jnp.full((batch_size,), frames * hop, jnp.int32),
        sid=sid,
    )


def run(hps, max_steps: Optional[int] = None) -> None:
    """Train per the config; the equivalent of train.py's run() (train.py:52-120)."""
    if hps.tpu.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)
    from smart_vocoder_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(hps.tpu.get("compilation_cache", True))

    is_chief = jax.process_index() == 0
    logger = logging_utils.get_logger(hps.model_dir) if is_chief else None
    if is_chief:
        logger.info(hps)
        logging_utils.check_git_hash(hps.model_dir, logger)
        writer = logging_utils.make_writer(hps.model_dir)
        writer_eval = logging_utils.make_writer(f"{hps.model_dir}/eval")

    mesh = make_mesh(data=hps.tpu.data_parallel, model=hps.tpu.model_parallel)
    use_sid = bool(hps.model.get("use_spk_embed", False)) and hps.data.n_speakers > 0

    cache_specs = bool(hps.tpu.get("cache_specs", False))
    train_dataset = AudioSpecDataset(hps.data.training_files, hps.data,
                                     cache_specs=cache_specs)
    train_sampler = BucketSampler(
        train_dataset.lengths,
        hps.train.batch_size * mesh.shape["data"] // jax.process_count(),
        list(hps.tpu.bucket_boundaries),
        num_replicas=jax.process_count(),
        rank=jax.process_index(),
        shuffle=True,
    )
    train_loader = BucketedLoader(train_dataset, train_sampler, with_sid=use_sid)
    if is_chief:
        eval_dataset = AudioSpecDataset(hps.data.validation_files, hps.data,
                                        cache_specs=cache_specs)
        eval_sampler = BucketSampler(
            eval_dataset.lengths, 1, list(hps.tpu.bucket_boundaries), shuffle=False,
        )
        eval_loader = BucketedLoader(eval_dataset, eval_sampler, with_sid=use_sid)

    dtype = jnp.bfloat16 if hps.tpu.bf16_run else jnp.float32
    net_g = build_synthesizer(hps, dtype=dtype, training=True)
    net_d = MultiPeriodDiscriminator(
        hps.model.get("use_spectral_norm", False),
        width_mult=float(hps.model.get("disc_width_mult", 1.0)),
        dtype=dtype,
    )
    tx_g, tx_d = make_optimizer(hps), make_optimizer(hps)

    init_batch = _synthetic_init_batch(hps, hps.train.batch_size)
    state = init_train_state(hps, net_g, net_d, tx_g, tx_d,
                             jax.random.key(hps.train.seed), init_batch)

    mngr = ckpt_lib.CheckpointManager(hps.model_dir, keep=hps.tpu.keep_ckpts)
    # Shard BEFORE restoring: orbax then restores each process's addressable
    # shards in place (multi-host safe), instead of materializing the full
    # state on every host.
    state = jax.device_put(state, state_shardings(mesh, state))
    state, epoch_start, resumed = ckpt_lib.try_resume(mngr, state)
    # Mid-epoch resume: replay position inside the interrupted epoch from the
    # deterministic epoch-seeded sampler order (checkpoints happen every
    # eval_interval steps, not at epoch boundaries).
    steps_per_epoch = max(1, len(train_loader))
    skip_batches = 0
    if resumed:
        skip_batches = int(state.step) - (epoch_start - 1) * steps_per_epoch
        if not 0 <= skip_batches < steps_per_epoch:
            # dataset/config changed since save: start the next epoch cleanly
            epoch_start, skip_batches = epoch_start + (skip_batches > 0), 0
        if is_chief:
            logger.info("resumed from step %d (epoch %d, batch %d)",
                        int(state.step), epoch_start, skip_batches)
    step_fn = jit_train_step(make_train_step(hps, net_g, net_d, tx_g, tx_d), mesh, state)

    # eval/infer fn (rank0): mirrors evaluate() (train.py:251-310)
    mel_cfg = MelConfig.from_hparams(hps)
    infer_fn = jax.jit(
        partial(_infer_apply, net_g),
        static_argnames=("max_len",),
    )

    base_key = jax.random.key(hps.train.seed + 1)
    global_step = int(state.step)
    last_saved_step = global_step if resumed else -1  # don't re-save the resume step
    timer = StepTimer()
    profiler = StepProfiler(
        f"{hps.model_dir}/profile",
        global_step + int(hps.tpu.get("profile_start_step", 10)),
        int(hps.tpu.get("profile_steps", 0)),
    )
    samples_per_step = hps.train.batch_size * mesh.shape["data"] * hps.train.segment_size
    for epoch in range(epoch_start, hps.train.epochs + 1):
        train_sampler.set_epoch(epoch)
        lr = lr_for_epoch(hps, epoch)
        state = state.replace(
            opt_g=set_learning_rate(state.opt_g, lr),
            opt_d=set_learning_rate(state.opt_d, lr),
        )

        t_epoch = time.time()
        start_batch = skip_batches if epoch == epoch_start else 0
        skip_batches = 0
        for batch_idx, batch in enumerate(train_loader.iter_from(start_batch),
                                          start=start_batch):
            profiler.maybe_start(global_step)
            step_key = jax.random.fold_in(base_key, global_step)
            batch = shard_batch(mesh, batch)
            state, metrics = step_fn(state, batch, step_key)
            timer.tick()
            profiler.maybe_stop(global_step)

            if is_chief and global_step % hps.train.log_interval == 0:
                metrics = jax.device_get(metrics)
                losses = [metrics["loss/d/total"], metrics["loss/g/total"],
                          metrics["loss/g/fm"], metrics["loss/g/mel"], metrics["loss/g/kl"]]
                logger.info("Train Epoch: %d [%.0f%%]", epoch,
                            100.0 * batch_idx / max(1, len(train_loader)))
                logger.info([float(x) for x in losses] + [global_step, lr])
                scalars = {k: float(v) for k, v in metrics.items()
                           if not k.startswith("image/")}
                scalars["learning_rate"] = lr
                scalars.update(timer.metrics(samples_per_step))
                # training-health mel images under the reference's TB names
                # (train.py:230-239); arrays are (T, n_mels), plotted (C, T)
                images = {
                    name: logging_utils.plot_spectrogram_to_numpy(
                        np.asarray(metrics[key], np.float32).T)
                    for name, key in (
                        ("slice/mel_org", "image/slice_mel_org"),
                        ("slice/mel_gen", "image/slice_mel_gen"),
                        ("all/mel", "image/all_mel"),
                    )
                }
                logging_utils.summarize(writer, global_step, scalars=scalars,
                                        images=images)

            if global_step % hps.train.eval_interval == 0 and global_step != last_saved_step:
                if is_chief:
                    _evaluate(hps, net_g, state, eval_loader, infer_fn, mel_cfg,
                              writer_eval, global_step)
                # every process participates in a sharded save (chief-only
                # device_get would fail on non-addressable shards)
                mngr.save(global_step, state, epoch)
                _export_torch_ckpts(hps, state, global_step, lr, logger)
                last_saved_step = global_step

            global_step += 1
            if max_steps is not None and global_step >= max_steps:
                profiler.close()
                if global_step != last_saved_step:
                    mngr.save(global_step, state, epoch)
                    _export_torch_ckpts(hps, state, global_step, lr, logger)
                mngr.wait()
                return

        if is_chief:
            logger.info("====> Epoch: %d (%.1fs)", epoch, time.time() - t_epoch)

    if global_step != last_saved_step:
        mngr.save(global_step, state, hps.train.epochs)
        _export_torch_ckpts(hps, state, global_step,
                            lr_for_epoch(hps, hps.train.epochs), logger)
    mngr.wait()


def _export_torch_ckpts(hps, state, step: int, lr: float, logger) -> None:
    """Mirror each orbax save as reference-format ``G_<step>.pth`` /
    ``D_<step>.pth`` in the model dir (chief only).

    Reference tooling globs ``G_*.pth`` there (utils.py:70-75, saves at
    train.py:243-244); with this, a reference consumer pointed at
    ``logs/<model>/`` finds working checkpoints (loadable by the reference's
    own ``load_checkpoint`` -- tests/test_e2e_training.py). Orbax remains the
    resumable source of truth (optimizer state is not portable, so the .pth
    carries an empty optimizer dict). Disable with ``tpu.export_torch_ckpt:
    false``. Skipped (once, with a warning) when param shards are not all
    chief-addressable (multi-host model parallelism).
    """
    import os

    if not bool(hps.tpu.get("export_torch_ckpt", True)) or jax.process_index() != 0:
        return
    if any(not getattr(x, "is_fully_addressable", True)
           for x in jax.tree.leaves((state.params_g, state.params_d))):
        if logger and not getattr(_export_torch_ckpts, "_warned", False):
            _export_torch_ckpts._warned = True
            logger.warning(
                ".pth export skipped: params not fully chief-addressable "
                "(multi-host model parallelism); export from orbax with "
                "scripts/export_pth.py")
        return
    from smart_vocoder_tpu.utils.torch_compat import save_torch_checkpoint

    for tag, params in (("G", state.params_g), ("D", state.params_d)):
        path = os.path.join(hps.model_dir, f"{tag}_{step}.pth")
        save_torch_checkpoint(path, jax.device_get(params),
                              iteration=step, learning_rate=lr)
    # Apply the same keep-latest-N retention orbax enforces (keep_ckpts), so
    # the mirror set always equals the restorable orbax step set.
    keep = int(hps.tpu.get("keep_ckpts", 0))
    if keep > 0:
        for tag in ("G", "D"):
            steps = sorted(
                int(f[len(tag) + 1:-4])
                for f in os.listdir(hps.model_dir)
                if f.startswith(f"{tag}_") and f.endswith(".pth")
                and f[len(tag) + 1:-4].isdigit()
            )
            for old in steps[:-keep]:
                os.remove(os.path.join(hps.model_dir, f"{tag}_{old}.pth"))
    if logger:
        logger.info("Saving model and optimizer state at iteration %d to "
                    "%s/G_%d.pth (+D)", step, hps.model_dir, step)


def _infer_apply(net_g, params_g, mel, lengths, rng, sid=None, max_len=None):
    return net_g.apply(
        {"params": params_g}, mel, lengths, rng, sid=sid,
        noise_scale=1.0, max_len=max_len, method=SynthesizerTrn.infer,
    )


def _evaluate(hps, net_g, state, eval_loader, infer_fn, mel_cfg, writer_eval,
              global_step) -> None:
    """Eval audio/image logging + quality scalar (ref: train.py:251-310).

    The reference scores only the FIRST eval utterance (train.py:261-265) --
    a one-sample estimator whose trend is dominated by that utterance's
    idiosyncrasies. Here ``eval/mel_l1`` is the mean copy-synthesis mel-L1
    over a fixed set of the first ``tpu.eval_samples`` (default 8) validation
    utterances, batched into ONE compiled program (a single (K, 1000, n_mels)
    shape -- one extra compile vs the reference's B=1, amortized over the
    run). TB audio/image keep the reference's names and, like the reference,
    show sample 0.
    """
    n_eval = max(1, int(hps.tpu.get("eval_samples", 8)))
    mels, lens_l, sids, first_batch = [], [], [], None
    for batch in eval_loader:
        if first_batch is None:
            first_batch = batch
        mels.append(np.asarray(spec_to_mel(batch.spec[:1], mel_cfg)))
        lens_l.append(int(batch.spec_lengths[0]))
        if getattr(batch, "sid", None) is not None:
            sids.append(int(batch.sid[0]))
        if len(mels) >= n_eval:
            break
    if first_batch is None:
        return
    # Static eval shape: pad/crop every mel to exactly max_len frames and the
    # batch to exactly n_eval rows (repeat row 0; duplicates are excluded
    # from the mean) so infer_fn compiles ONCE regardless of which buckets
    # the eval utterances land in. The sequence mask zeroes the padded tail,
    # matching the reference's max_len=1000 crop (train.py:273).
    max_len = 1000
    n_real = len(mels)
    mel = np.zeros((n_eval, max_len, mels[0].shape[-1]), np.float32)
    for i in range(n_eval):
        m = mels[i if i < n_real else 0][0]
        t = min(m.shape[0], max_len)
        mel[i, :t] = m[:t]
    mel = jnp.asarray(mel)
    lens_np = np.asarray(
        [min(lens_l[i if i < n_real else 0], max_len) for i in range(n_eval)],
        np.int32)
    lens = jnp.asarray(lens_np)
    # Speaker-conditioned models evaluate with each sample's own sid (the
    # reference's evaluate() drops sid entirely, train.py:273 -- that would
    # copy-synthesize every eval through the null speaker embedding and make
    # the eval mel-L1 trend meaningless in use_spk_embed mode).
    sid = None
    if sids:
        sid = jnp.asarray([sids[i if i < n_real else 0] for i in range(n_eval)],
                          jnp.int32)
    y_hat, mask, _ = infer_fn(
        state.params_g, mel, lens, jax.random.key(0), sid=sid, max_len=max_len,
    )
    y_hat = np.asarray(jax.device_get(y_hat), dtype=np.float32)
    y_hat_len = int(np.asarray(mask[0]).sum() * hps.data.hop_length)

    y_hat_mel = np.asarray(mel_spectrogram(jnp.asarray(y_hat[..., 0]), mel_cfg))
    # Copy-synthesis mel-L1 over each sample's valid frames, averaged over
    # the fixed eval set: the quality scalar behind CONVERGENCE.md's trend
    # table. The generated mel is one frame shorter than the (center=False)
    # input mel grid at equal sample counts; compare the overlap.
    mel_np = np.asarray(mel)
    per_sample = []
    for i in range(n_real):
        n_valid = min(int(lens_np[i]), y_hat_mel.shape[1])
        per_sample.append(float(np.mean(np.abs(
            y_hat_mel[i, :n_valid] - mel_np[i, :n_valid]))))
    mel_l1 = float(np.mean(per_sample))
    images = {
        "gen/mel": logging_utils.plot_spectrogram_to_numpy(y_hat_mel[0].T)
    }
    audios = {"gen/audio": y_hat[0, :y_hat_len, 0]}
    if global_step == 0:
        images["gt/mel"] = logging_utils.plot_spectrogram_to_numpy(mel_np[0].T)
        wav_len = int(first_batch.wav_lengths[0])
        audios["gt/audio"] = np.asarray(first_batch.wav[0, :wav_len, 0])

    logging_utils.summarize(
        writer_eval, global_step, images=images, audios=audios,
        scalars={"eval/mel_l1": mel_l1},
        audio_sampling_rate=hps.data.sampling_rate,
    )
    # also to train.log (the model-dir logger), so report_convergence.py gets
    # the quality trend without a TB event reader
    logging_utils.get_logger(hps.model_dir).info(
        "eval step %d: mel_l1 %.4f", global_step, mel_l1)
