"""Persistent XLA compilation cache: pay each program's compile once per host.

The flagship GAN training step takes 10+ minutes to compile on a v5e host and
the batched serving program a couple more; the reference (eager torch,
train.py:52-310) never pays a compile, so every restart of this framework was
strictly worse at startup.  JAX's persistent compilation cache keys serialized
executables by (optimized HLO, compiler flags, backend topology) and replays
them across processes, which makes restart-after-preemption, mid-epoch resume
(SURVEY.md section 5 failure-recovery row) and repeated bench/CLI invocations
skip straight to execution.

Enabled by default everywhere (training loop, Vocoder, bench.py) under
``~/.cache/smart_vocoder_tpu/xla``; override or disable with the ``tpu`` config
block (``"compilation_cache": "/path"`` | ``false``) or the
``SMART_VOCODER_XLA_CACHE`` env var (``off`` disables).  Failures -- a backend
whose PJRT plugin cannot serialize executables, a read-only filesystem --
degrade to a logged warning with caching off; numerics are never affected.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Union

logger = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "smart_vocoder_tpu", "xla")
_OFF_VALUES = ("", "0", "off", "none", "false", "disabled")


def resolve_cache_dir(knob: Union[bool, str, None] = True) -> Optional[str]:
    """Map the config knob x env var to a cache directory (None = disabled).

    Precedence: ``SMART_VOCODER_XLA_CACHE`` env var > config knob. A string
    knob is a directory; ``True`` means the default directory.
    """
    env = os.environ.get("SMART_VOCODER_XLA_CACHE")
    if env is not None:
        env = env.strip()
        return None if env.lower() in _OFF_VALUES else env
    if knob is None or isinstance(knob, bool):
        return _DEFAULT_DIR if knob else None
    if isinstance(knob, (int, float)):
        # JSON configs often say "compilation_cache": 1 -- bool-like, not a
        # directory name.
        return _DEFAULT_DIR if knob else None
    knob = str(knob).strip()
    return None if knob.lower() in _OFF_VALUES else knob


def enable_compilation_cache(knob: Union[bool, str, None] = True) -> Optional[str]:
    """Idempotently enable JAX's persistent compilation cache.

    Returns the active cache directory, or None when disabled/unavailable.
    Must run before the programs of interest are compiled (it is config-level,
    so calling after some compiles simply caches later ones).
    """
    path = resolve_cache_dir(knob)
    if path is None:
        return None
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Training-step compiles are minutes; serving programs tens of
        # seconds; tiny host programs are cheaper to recompile than to disk
        # round-trip. 5 s keeps every program that matters.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return path
    except Exception as exc:  # pragma: no cover - backend/filesystem specific
        logger.warning("persistent compilation cache disabled: %s", exc)
        return None
