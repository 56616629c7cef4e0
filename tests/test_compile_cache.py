"""Persistent compilation cache (utils/compile_cache.py).

The cache is config-level JAX state, so the write test scopes it to a tmpdir
and restores the previous config after.  Entries land on disk as files keyed
by the optimized HLO -- a second process (or resumed run) replays them instead
of recompiling; here we assert the entry is written at all.
"""

import os

import jax
import jax.numpy as jnp

from smart_vocoder_tpu.utils.compile_cache import (
    enable_compilation_cache,
    resolve_cache_dir,
)


def test_resolve_precedence(monkeypatch):
    monkeypatch.delenv("SMART_VOCODER_XLA_CACHE", raising=False)
    assert resolve_cache_dir(False) is None
    assert resolve_cache_dir(None) is None
    assert resolve_cache_dir("off") is None
    assert resolve_cache_dir(True).endswith(os.path.join("smart_vocoder_tpu", "xla"))
    assert resolve_cache_dir("/x/y") == "/x/y"
    # bool-like JSON values ("compilation_cache": 1 / 0) mean default-dir/off,
    # never a relative directory literally named "1"
    assert resolve_cache_dir(1) == resolve_cache_dir(True)
    assert resolve_cache_dir(0) is None
    # whitespace around a path knob/env is not part of the directory name
    assert resolve_cache_dir("  /x/y  ") == "/x/y"
    monkeypatch.setenv("SMART_VOCODER_XLA_CACHE", " /env/pad ")
    assert resolve_cache_dir(True) == "/env/pad"
    monkeypatch.delenv("SMART_VOCODER_XLA_CACHE")
    # env var wins over the knob, both directions
    monkeypatch.setenv("SMART_VOCODER_XLA_CACHE", "off")
    assert resolve_cache_dir(True) is None
    monkeypatch.setenv("SMART_VOCODER_XLA_CACHE", "/env/dir")
    assert resolve_cache_dir(False) == "/env/dir"


def test_cache_entry_written(tmp_path, monkeypatch):
    monkeypatch.delenv("SMART_VOCODER_XLA_CACHE", raising=False)
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        cache_dir = enable_compilation_cache(str(tmp_path / "xla"))
        assert cache_dir == str(tmp_path / "xla")
        # force even this test's instant compile to be persisted
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T).sum()

        f(jnp.ones((64, 64))).block_until_ready()
        entries = os.listdir(cache_dir)
        assert entries, "no persistent cache entry written"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_size)
