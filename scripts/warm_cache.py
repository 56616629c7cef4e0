#!/usr/bin/env python
"""Pre-warm the persistent XLA compilation cache for the driver/production
programs (VERDICT r4 next #6: 414 s cold-start compile dominated the driver's
bench wall time).

Compiles-and-runs (with minimal iteration counts) the exact programs the
headline surfaces use, so their executables land in the persistent cache
(utils/compile_cache.py, default ~/.cache/smart_vocoder_tpu/xla):

  1. bench.py            -- batched serving (serving-fidelity + fast paths,
                            fidelity probes) AND the full GAN train step
                            (its train phase runs scripts/bench_train.py)
  2. __graft_entry__.py  -- the single-chip entry() program

Any later invocation of the same code on the same topology replays the
executables instead of recompiling: measured on the v5e, bench.py first
compile+run drops 414.5 s -> 78.3 s. Run this once per fresh
environment/after code changes (e.g. in CI after tests); it is idempotent
and exits non-zero if any program fails.

Usage: python scripts/warm_cache.py
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd, env_extra=None, timeout=2400) -> None:
    env = dict(os.environ)
    env.update(env_extra or {})
    t0 = time.time()
    print(f"[warm_cache] {name}: {' '.join(cmd)}", flush=True)
    p = subprocess.run(cmd, cwd=ROOT, env=env, timeout=timeout)
    if p.returncode != 0:
        print(f"[warm_cache] {name} FAILED rc={p.returncode}", flush=True)
        sys.exit(p.returncode)
    print(f"[warm_cache] {name} ok in {time.time() - t0:.0f}s", flush=True)


def main() -> None:
    # minimal timing iterations -- we want the compiles, not the statistics
    run("bench (serving + train step)",
        [sys.executable, "bench.py"], {"BENCH_ITERS": "2"})
    run("graft entry",
        [sys.executable, "-c",
         "import __graft_entry__ as g, jax; fn, a = g.entry(); "
         "print(jax.jit(fn)(*a).shape)"])
    from smart_vocoder_tpu.utils.compile_cache import resolve_cache_dir

    path = resolve_cache_dir(True)
    n = len(os.listdir(path)) if path and os.path.isdir(path) else 0
    print(f"[warm_cache] done: {n} entries in {path}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, ROOT)
    main()
