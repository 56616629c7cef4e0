"""Mesh construction and sharding rules.

Default layout is a 2-D ``('data', 'model')`` mesh:
  - ``data``: batch dimension of every input; gradients all-reduce over it
    (the DDP replacement, SURVEY.md section 2.5).
  - ``model``: optional channel sharding of large conv weights (tensor
    parallelism). Size 1 by default -- the reference model at 192 hidden
    channels fits comfortably on one chip; the axis exists so scaled-up
    variants shard without code changes.

Rules are shape-driven: any parameter tensor whose leading (output-channel)
dim divides the model-axis size and is >= 128 lanes is sharded on it; XLA's
partitioner inserts the halo/all-gather collectives convs need.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Create a ('data', 'model') mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} needs more than {n} devices"
    devices = devices[: data * model]
    dev_array = mesh_utils.create_device_mesh((data, model), devices=np.asarray(devices))
    return Mesh(dev_array, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def _leaf_spec(leaf: Any, model_size: int) -> P:
    shape = getattr(leaf, "shape", ())
    if (
        model_size > 1
        and len(shape) >= 2
        and shape[0] >= 128
        and shape[0] % model_size == 0
    ):
        return P("model")
    return P()


def param_shardings(mesh: Mesh, tree: Any):
    """Sharding pytree for params / optimizer state (same leaf shapes)."""
    model_size = mesh.shape["model"]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, model_size)), tree
    )


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch onto the mesh, split over the data axis.

    Multi-host: each process holds only its sampler shard (``global / P``
    rows, loop.py's rank-striped BucketSampler), so the global array must be
    assembled from process-local data -- ``device_put`` would treat the local
    shard as the full global value and silently train on a per-process-
    divergent "global" batch.

    Row-order contract (multi-host): ``make_array_from_process_local_data``
    places process ``p``'s local rows at the data-axis positions of ``p``'s
    addressable devices, in device-index order. If ``create_device_mesh``
    interleaves processes along 'data', the resulting GLOBAL row order is a
    fixed permutation of the sampler's rank-striped order. This is harmless
    for training -- every loss/gradient reduces over the batch axis, so the
    step is permutation-invariant -- but two observables may differ from a
    single-host run with the same seed: (a) row-indexed logging
    (``image/slice_mel_org`` shows whichever sample landed in global row 0),
    and (b) bit-level metric parity (f32 reduction order follows row order).
    tests/test_multiprocess.py runs real 2- and 4-process clusters against
    these semantics.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    import numpy as np

    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        batch,
    )


def state_shardings(mesh: Mesh, state: Any):
    """Shardings for a TrainState: params/opt sharded by rule, scalars replicated."""
    return param_shardings(mesh, state)


def jit_train_step(step_fn, mesh: Mesh, state, donate: bool = True):
    """jit the train step with explicit shardings over the mesh.

    Gradient all-reduce over 'data' and any 'model'-axis collectives are
    inserted by the partitioner -- no explicit communication code (the
    TPU-native replacement for DDP's NCCL backward hooks, train.py:98-99).
    """
    state_sh = state_shardings(mesh, state)
    batch_sh = batch_sharding(mesh)
    rng_sh = replicated(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh, rng_sh),
        out_shardings=(state_sh, replicated(mesh)),
        donate_argnums=(0,) if donate else (),
    )
