"""Checkpoint / resume (L8) on orbax, plus reference-checkpoint import.

Reference behaviour preserved (utils.py:18-75, train.py:101-107):
  - periodic saves keyed by global step, auto-resume from the latest
  - partial-load tolerance when importing torch checkpoints
  - payload carries {train_state, epoch} (the reference stores
    {model, iteration, optimizer, learning_rate} split across G_/D_ files;
    here one atomic pytree keeps G, D, and both optimizer states consistent)

Orbax gives async, atomic, preemption-tolerant checkpointing -- the
elastic-recovery capability the reference approximates with a bare
try/except resume (SURVEY.md section 5).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from smart_vocoder_tpu.utils.torch_compat import (
    load_torch_checkpoint,
    params_from_torch_state_dict,
)


class CheckpointManager:
    """Thin wrapper around ocp.CheckpointManager for the train loop."""

    def __init__(self, model_dir: str, keep: int = 5):
        self.directory = os.path.abspath(os.path.join(model_dir, "checkpoints"))
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(self, step: int, state: Any, epoch: int) -> None:
        """Save the (possibly sharded) train state.

        Pass device arrays directly -- orbax snapshots them to host
        synchronously and writes async/atomically. Under multi-host sharding
        EVERY process must call this (each writes its addressable shards);
        do NOT ``jax.device_get`` first (non-addressable shards would fail)
        and do not guard with a chief-only check.
        """
        payload = {"state": state, "epoch": epoch}
        self._mngr.save(step, args=ocp.args.StandardSave(payload))

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, abstract_state: Any, step: Optional[int] = None) -> Tuple[Any, int, int]:
        """Returns (state, epoch, step). ``abstract_state`` provides structure
        (e.g. a freshly-initialized TrainState)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        # to_shape_dtype_struct preserves shardings: pass a device_put
        # abstract_state to restore distributed/sharded, a host pytree for
        # single-process restore.
        target = {
            "state": jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state),
            "epoch": 0,
        }
        restored = self._mngr.restore(step, args=ocp.args.StandardRestore(target))
        return restored["state"], int(restored["epoch"]), int(step)


def try_resume(mngr: CheckpointManager, abstract_state: Any):
    """Auto-resume like train.py:101-107: latest checkpoint, else fresh start.

    Returns (state, epoch_in_progress, resumed: bool). Checkpoints are taken
    mid-epoch (every eval_interval steps), so the stored epoch is the one
    that was RUNNING at save time; the caller resumes into that same epoch
    and skips the batches already consumed (derivable from state.step and the
    deterministic epoch-seeded sampler order) instead of jumping to epoch+1
    and silently dropping the remainder.

    A fresh directory (no checkpoints yet) is the normal fresh-start case and
    stays silent. Anything else -- a checkpoint exists but failed to load
    (corruption, structure mismatch) -- is logged at WARNING before falling
    back to a fresh start, instead of the reference's silent bare try/except
    (train.py:101-107) that would quietly restart a long run at step 0."""
    import logging

    try:
        state, epoch, _ = mngr.restore(abstract_state)
        return state, max(1, epoch), True
    except FileNotFoundError:
        return abstract_state, 1, False  # no checkpoints yet: normal fresh start
    except Exception as e:  # noqa: BLE001 -- deliberate catch-all fallback
        logging.getLogger("smart_vocoder_tpu").warning(
            "resume failed from %s (latest step %s): %s: %s -- starting fresh "
            "at step 0", mngr.directory, mngr.latest_step(), type(e).__name__, e)
        return abstract_state, 1, False


def load_reference_generator(pth_path: str, params_g: Any) -> Tuple[Any, int]:
    """Import a reference ``G_<step>.pth`` into a generator param pytree.

    Returns (params, iteration). Partial-load tolerant (utils.py:30-36)."""
    payload = load_torch_checkpoint(pth_path)
    params = params_from_torch_state_dict(payload["model"], params_g)
    return params, int(payload.get("iteration", 0))


def load_reference_discriminator(pth_path: str, params_d: Any) -> Tuple[Any, int]:
    """Import a reference ``D_<step>.pth`` into a discriminator param pytree."""
    payload = load_torch_checkpoint(pth_path)
    params = params_from_torch_state_dict(payload["model"], params_d)
    return params, int(payload.get("iteration", 0))
