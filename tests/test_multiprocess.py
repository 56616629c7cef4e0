"""REAL multi-process training: 2 jax.distributed processes x 4 CPU devices.

The multi-host branches (rank-striped sampler, process-local -> global batch
assembly in parallel/mesh.py shard_batch, all-process orbax saves, chief-only
logging/eval) are otherwise exercised only at process_count == 1 or with
stubbed process indices. Here two actual processes form a jax.distributed
cluster over an 8-device global CPU mesh and run 3 training steps end to end
-- the TPU-native equivalent of the reference's torchrun/DDP launch
(reference train.py:61, :98-99).
"""

import os
import socket
import subprocess
import sys

import pytest

from tests.test_e2e_training import make_config, make_dataset

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
import jax
jax.distributed.initialize(coordinator_address=sys.argv[1], num_processes=2,
                           process_id=int(sys.argv[2]))
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
from smart_vocoder_tpu.config import load_config
from smart_vocoder_tpu.training.loop import run
hps = load_config(sys.argv[3])
hps.model_dir = sys.argv[4]
# the shared tiny config pins data_parallel=2 for single-process mesh tests;
# here the mesh must span both processes' devices
hps.tpu.data_parallel = -1
run(hps, max_steps=3)
print("WORKER_DONE", jax.process_index(), flush=True)
"""


@pytest.mark.slow
def test_two_process_training(tmp_path):
    filelist = make_dataset(tmp_path)
    cfg_path = make_config(tmp_path, filelist)
    model_dir = os.path.join(str(tmp_path), "run_2proc")
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
            [sys.executable, "-c", WORKER, coord, str(i), cfg_path, model_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_DONE {i}" in out

    # chief wrote logs + TB; the checkpoint exists and records step 3
    assert os.path.exists(os.path.join(model_dir, "train.log"))
    ckpt_root = os.path.join(model_dir, "checkpoints")
    steps = sorted(int(d) for d in os.listdir(ckpt_root) if d.isdigit())
    assert steps and steps[-1] == 3, steps
    # the sharded save has content from the distributed run (non-empty dir)
    assert os.listdir(os.path.join(ckpt_root, str(steps[-1])))
