"""Device mesh + sharding rules (the TPU-native replacement for DDP/NCCL).

The reference's only parallelism is single-node data parallelism via
``mp.spawn`` + ``DistributedDataParallel`` over NCCL (train.py:40-49, :61,
:98-99). Here the same capability (and more) comes from the XLA compilation
model: batches are sharded over the ``data`` mesh axis, parameters are
replicated (or channel-sharded over an optional ``model`` axis), and gradient
all-reduces are inserted by the partitioner -- riding ICI inside a pod, DCN
across pods, with zero explicit communication code.
"""

from smart_vocoder_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "param_shardings",
    "replicated",
    "shard_batch",
]
