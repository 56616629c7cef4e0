"""REAL multi-process training: N jax.distributed processes over one 8-device
global CPU mesh (2 procs x 4 devices, 4 procs x 2 devices).

The multi-host branches (rank-striped sampler, process-local -> global batch
assembly in parallel/mesh.py shard_batch, all-process orbax saves, chief-only
logging/eval) are otherwise exercised only at process_count == 1 or with
stubbed process indices. Here actual processes form a jax.distributed cluster
and run 3 training steps end to end -- the TPU-native equivalent of the
reference's torchrun/DDP launch (reference train.py:61, :98-99). The chief's
per-step loss trajectory is parsed out of train.log and checked finite and
complete; exact cross-process-count equality is NOT asserted because the
global row order is rank-striped (parallel/mesh.py shard_batch row-order
contract), which re-pairs per-row slice randomness with different samples.
"""

import ast
import math
import os
import re
import socket
import subprocess
import sys

import pytest

from tests.test_e2e_training import make_config, make_dataset

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
nproc = int(sys.argv[5])
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={8 // nproc}"
)
import jax
jax.distributed.initialize(coordinator_address=sys.argv[1], num_processes=nproc,
                           process_id=int(sys.argv[2]))
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.training.loop import run
hps = load_config(sys.argv[3])
hps.model_dir = sys.argv[4]
# the shared tiny config pins data_parallel=2 for single-process mesh tests;
# here the mesh must span all processes' devices
hps.tpu.data_parallel = -1
run(hps, max_steps=3)
print("WORKER_DONE", jax.process_index(), flush=True)
"""


def _loss_trajectory(log_path):
    """Parse the chief's per-step loss lists out of train.log.

    The loop logs ``[loss_d, loss_g, fm, mel, kl, step, lr]`` at every
    log_interval (loop.py): literal python lists, one per step."""
    traj = {}
    for line in open(log_path):
        m = re.search(r"(\[[-0-9eE+., ]+\])\s*$", line)
        if not m:
            continue
        try:
            vals = ast.literal_eval(m.group(1))
        except (ValueError, SyntaxError):
            continue
        if isinstance(vals, list) and len(vals) == 7:
            traj[int(vals[5])] = vals[:5]
    return traj


@pytest.mark.slow
@pytest.mark.parametrize("nproc", [2, 4])
def test_multi_process_training(tmp_path, nproc):
    filelist = make_dataset(tmp_path)
    cfg_path = make_config(tmp_path, filelist)
    model_dir = os.path.join(str(tmp_path), f"run_{nproc}proc")
    os.makedirs(model_dir, exist_ok=True)

    # Hold the OS-assigned port with SO_REUSEADDR until just before the
    # workers launch: binding, closing early, and reusing later is a TOCTOU
    # race under parallel CI (another process can grab the freed port).
    # jax.distributed's coordinator binds with SO_REUSEADDR itself, so it can
    # take over the instant we close.
    s = socket.socket()
    s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    s.bind(("localhost", 0))
    coord = f"localhost:{s.getsockname()[1]}"

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    s.close()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, coord, str(i), cfg_path, model_dir,
             str(nproc)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    # every process XLA-compiles the same 8-device SPMD program independently
    # and concurrently; budget scales with the process count
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600 * nproc)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_DONE {i}" in out

    # chief wrote logs + TB; the checkpoint exists and records step 3
    log_path = os.path.join(model_dir, "train.log")
    assert os.path.exists(log_path)
    ckpt_root = os.path.join(model_dir, "checkpoints")
    steps = sorted(int(d) for d in os.listdir(ckpt_root) if d.isdigit())
    assert steps and steps[-1] == 3, steps
    # the sharded save has content from the distributed run (non-empty dir)
    assert os.listdir(os.path.join(ckpt_root, str(steps[-1])))

    # loss trajectory: all 3 steps logged by the chief, every component
    # finite and positive (a diverged/NaN distributed step would poison
    # these immediately; the D loss starts near 2.0 = sum of 6 LSGAN pairs
    # and the G total is dominated by c_mel * mel-L1, both strictly > 0)
    traj = _loss_trajectory(log_path)
    assert sorted(traj) == [0, 1, 2], sorted(traj)
    for step, losses in traj.items():
        assert all(math.isfinite(v) for v in losses), (step, losses)
        assert losses[0] > 0 and losses[1] > 0, (step, losses)
