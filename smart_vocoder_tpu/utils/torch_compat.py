"""Bidirectional bridge between reference PyTorch checkpoints and our params.

Because the conv modules store parameters in the torch layout (nn/conv.py),
conversion is pure *name* mapping with no tensor reshuffling:

  torch ``enc_q.enc.in_layers.3.weight_v``  <->  path ('enc_q','enc','in_layers_3','weight_v')
  torch ``emb_g.weight``                    <->  path ('emb_g','embedding')

`params_from_torch_state_dict` is partial-load tolerant like the reference's
`load_checkpoint` (utils.py:30-36): keys missing from the source keep their
current value, extra source keys are reported. This is what lets a reference
``G_<step>.pth`` drive our TPU inference path directly.

torch is only needed when actually reading a ``.pth`` file; the state-dict
converters work on plain numpy mappings.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Mapping, Tuple

import flax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

Path = Tuple[str, ...]


def torch_key_to_path(key: str) -> Path:
    """``a.b.0.weight_v`` -> ``('a', 'b_0', 'weight_v')``; embeddings special-cased."""
    parts = key.split(".")
    path: list[str] = []
    for p in parts:
        if p.isdigit() and path:
            path[-1] = f"{path[-1]}_{p}"
        else:
            path.append(p)
    if path[:1] == ["emb_g"] and path[-1] == "weight":
        path[-1] = "embedding"
    return tuple(path)


def path_to_torch_key(path: Path) -> str:
    """Inverse of :func:`torch_key_to_path` for our naming scheme."""
    parts: list[str] = []
    for p in path:
        head, _, tail = p.rpartition("_")
        if head and tail.isdigit():
            parts.extend([head, tail])
        else:
            parts.append(p)
    key = ".".join(parts)
    if key == "emb_g.embedding":
        key = "emb_g.weight"
    return key


def params_from_torch_state_dict(
    state_dict: Mapping[str, Any],
    target_params: Dict[str, Any],
    strict: bool = False,
) -> Dict[str, Any]:
    """Map a torch state_dict onto the structure of ``target_params``.

    Tensors are converted via ``numpy()`` (values pass through unchanged --
    layouts already agree). Returns a new pytree.
    """
    flat_target = flax.traverse_util.flatten_dict(flax.core.unfreeze(target_params))
    source = {torch_key_to_path(k): v for k, v in state_dict.items()}

    out = {}
    missing = []
    for path, cur in flat_target.items():
        if path in source:
            val = source.pop(path)
            if hasattr(val, "detach"):
                val = val.detach().cpu().numpy()
            val = np.asarray(val)
            if val.shape != tuple(cur.shape):
                raise ValueError(f"shape mismatch at {path}: ckpt {val.shape} vs params {cur.shape}")
            out[path] = jnp.asarray(val, dtype=cur.dtype)
        else:
            missing.append(path)
            out[path] = cur
    if missing:
        for p in missing:
            logger.info("%s is not in the checkpoint", ".".join(p))
    if source:
        for p in source:
            logger.info("checkpoint key unused by model: %s", ".".join(p))
        if strict and any(not _ignorable(p) for p in source):
            raise KeyError(f"unused checkpoint keys in strict mode: {list(source)[:5]}")
    if strict and missing:
        raise KeyError(f"params missing from checkpoint in strict mode: {missing[:5]}")
    return flax.traverse_util.unflatten_dict(out)


def _ignorable(path: Path) -> bool:
    # cond_layer params exist in reference checkpoints (gin_channels=256 is
    # plumbed everywhere) but are only materialized here when conditioning is
    # actually used; safe to drop.
    return any("cond_layer" in p or p == "cond" for p in path)


def torch_state_dict_from_params(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our params -> a torch-style state_dict of numpy arrays (for exporting
    to the reference implementation, e.g. in golden parity tests)."""
    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    return {path_to_torch_key(path): np.asarray(v) for path, v in flat.items()}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Read a reference ``G_*.pth`` / ``D_*.pth`` payload
    {model, iteration, optimizer, learning_rate} (ref: utils.py:46-56)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def save_torch_checkpoint(
    path: str,
    params: Dict[str, Any],
    iteration: int = 0,
    learning_rate: float = 0.0,
) -> None:
    """Export a param pytree as a reference-format ``.pth`` payload so models
    trained here can be consumed by reference tooling (utils.py:46-56 shape:
    {model, iteration, optimizer, learning_rate}; optimizer state is not
    portable across frameworks and is saved as an empty dict)."""
    import torch

    state_dict = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in torch_state_dict_from_params(params).items()
    }
    torch.save(
        {
            "model": state_dict,
            "iteration": iteration,
            "optimizer": {},
            "learning_rate": learning_rate,
        },
        path,
    )
