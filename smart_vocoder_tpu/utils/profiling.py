"""Tracing / profiling hooks (SURVEY.md section 5: absent in the reference;
first-class here).

- :class:`StepTimer` -- wall-clock steps/sec + audio-samples/sec, logged under
  ``perf/*`` TB scalars.
- :class:`StepProfiler` -- captures a jax.profiler trace (XLA + host) for a
  window of training steps into ``<model_dir>/profile``; view with
  TensorBoard's profile plugin. Enabled via the config's
  ``tpu.profile_steps`` (0 = off) + ``tpu.profile_start_step``.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._seen = 0
        self._t0: Optional[float] = None
        self._steps = 0

    def tick(self) -> None:
        self._seen += 1
        if self._seen == self.warmup:  # skip compile-dominated first steps
            self._t0 = time.perf_counter()
            self._steps = 0
        elif self._seen > self.warmup:
            self._steps += 1

    def metrics(self, samples_per_step: int) -> Dict[str, float]:
        if not self._t0 or self._steps == 0:
            return {}
        dt = (time.perf_counter() - self._t0) / self._steps
        return {
            "perf/steps_per_sec": 1.0 / dt,
            "perf/samples_per_sec": samples_per_step / dt,
            "perf/step_ms": dt * 1e3,
        }

    def reset_window(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0


class StepProfiler:
    """Trace steps [start, start + n) of training."""

    def __init__(self, log_dir: str, start_step: int, num_steps: int):
        self.log_dir = log_dir
        self.start = start_step
        self.stop_at = start_step + num_steps
        self.enabled = num_steps > 0
        self._active = False

    def maybe_start(self, step: int) -> None:
        if self.enabled and not self._active and step == self.start:
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def maybe_stop(self, step: int) -> None:
        if self._active and step >= self.stop_at:
            jax.profiler.stop_trace()
            self._active = False
            self.enabled = False

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
