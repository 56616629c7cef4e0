#!/usr/bin/env python
"""Training entry point, same CLI surface as the reference:

    python train.py -c configs/iitp_base.json -m iitp

(reference train.py:40-49 + README.md:39). Creates ./logs/<model>/, snapshots
the config there, and runs data-parallel GAN training over all local TPU
devices via one pjit'd step -- no mp.spawn, no NCCL, no process-per-device.
Multi-host: start the same command on every host (jax.distributed picks up the
topology) and the bucket sampler shards data by process index.
"""

import os

import jax

from smart_vocoder_tpu.config import get_hparams
from smart_vocoder_tpu.training.loop import run


def main() -> None:
    import argparse
    import sys

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--max-steps", type=int, default=None,
                       help="stop after N global steps (smoke runs/benchmarks)")
    ns, rest = extra.parse_known_args(sys.argv[1:])
    hps = get_hparams(rest)
    # Multi-host: a launcher provides coordinator env vars; single-host runs
    # skip distributed init entirely.
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    run(hps, max_steps=ns.max_steps)


if __name__ == "__main__":
    main()
