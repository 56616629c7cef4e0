#!/usr/bin/env python
"""Export an orbax training checkpoint as reference-format G_/D_<step>.pth.

The training loop mirrors every orbax save as .pth automatically on the chief
(training/loop.py _export_torch_ckpts) EXCEPT when parameters are not fully
chief-addressable (multi-host model parallelism) -- the loop's warning points
here. This CLI restores the orbax payload single-process (every shard is
addressable off-cluster) and writes the reference-format files
(/root/reference/utils.py:46-56 payload shape: {model, iteration, optimizer,
learning_rate}), loadable by the reference's own load_checkpoint.

Usage:
    python scripts/export_pth.py -c configs/iitp_base.json -m logs/iitp \
        [--step 5000] [--out-dir exported/]

Defaults: latest checkpoint step; .pth files land next to the orbax dir
(<model_dir>/G_<step>.pth, D_<step>.pth), exactly where reference tooling
globs for them (utils.py:70-75).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--config", required=True, help="config JSON")
    ap.add_argument("-m", "--model-dir", required=True,
                    help="training model dir (contains checkpoints/)")
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    ap.add_argument("--out-dir", default=None,
                    help="output directory (default: the model dir)")
    args = ap.parse_args()

    import jax

    from smart_vocoder_tpu.config import load_config
    from smart_vocoder_tpu.models import MultiPeriodDiscriminator, build_synthesizer
    from smart_vocoder_tpu.training.loop import _synthetic_init_batch
    from smart_vocoder_tpu.training.optim import make_optimizer
    from smart_vocoder_tpu.training.step import init_train_state
    from smart_vocoder_tpu.utils.checkpoint import CheckpointManager
    from smart_vocoder_tpu.training.optim import lr_for_epoch
    from smart_vocoder_tpu.utils.torch_compat import save_torch_checkpoint

    hps = load_config(args.config)
    net_g = build_synthesizer(hps)
    net_d = MultiPeriodDiscriminator(
        hps.model.get("use_spectral_norm", False),
        width_mult=float(hps.model.get("disc_width_mult", 1.0)),
    )
    tx = make_optimizer(hps)
    # Structure only (orbax restores into shapes); eval_shape avoids
    # materializing throwaway params.
    batch = _synthetic_init_batch(hps, 1)
    state_shape = jax.eval_shape(
        lambda k: init_train_state(hps, net_g, net_d, tx, tx, k, batch),
        jax.random.key(0),
    )
    # The checkpoint was saved under the training run's mesh; this CLI runs
    # off-cluster (typically 1 device), so restore with explicit
    # single-device target shardings instead of the recorded ones (orbax
    # refuses a topology mismatch otherwise).
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    state_shape = jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=sharding),
        state_shape,
    )
    mngr = CheckpointManager(args.model_dir)
    state, epoch, step = mngr.restore(state_shape, step=args.step)
    lr = lr_for_epoch(hps, max(1, epoch))

    out_dir = args.out_dir or args.model_dir
    os.makedirs(out_dir, exist_ok=True)
    for tag, params in (("G", state.params_g), ("D", state.params_d)):
        path = os.path.join(out_dir, f"{tag}_{step}.pth")
        save_torch_checkpoint(path, jax.device_get(params),
                              iteration=step, learning_rate=lr)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
