"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip behaviour (data-parallel pjit, collectives) is exercised without
TPU hardware via ``--xla_force_host_platform_device_count`` -- the TPU-native
answer to "multi-node tests without a cluster" (SURVEY.md section 4).

Must set env vars before the first ``import jax`` anywhere in the test run.
"""

import os
import sys

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU plugin,
# but tests want the deterministic f32 host backend + a virtual 8-device mesh.
# jax is already imported by pytest plugin autoloading, so setting the env var
# is not enough -- update the live config (safe while no backend exists yet).
os.environ["JAX_PLATFORMS"] = "cpu"
# Tests must not share the user-level persistent XLA cache: entries written by
# another machine replay AOT code compiled for different CPU features (ULP-level
# numeric drift + cpu_aot_loader warnings), and tests would poison the cache
# real runs replay. Subprocess-spawning tests inherit this via the env.
os.environ.setdefault("SMART_VOCODER_XLA_CACHE", "off")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Make the repo root importable regardless of how pytest is invoked.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_path() -> str:
    """Path to the read-only upstream reference (for golden-parity tests)."""
    return os.environ.get("SMARTVOC_REFERENCE", "/root/reference")


@pytest.fixture(scope="session")
def has_reference(reference_path) -> bool:
    return os.path.isdir(reference_path)


# ---- speed tiers -----------------------------------------------------------
# ``pytest -m fast`` gives CI/driver signal in <2 min; ``-m "not slow"``
# excludes only the multi-minute integration suites.
_FAST_MODULES = {
    "test_dsp", "test_data", "test_native_wavio", "test_packed_conv",
    "test_wn_kernel", "test_config_and_ckpt", "test_voice_conversion",
}
_SLOW_MODULES = {
    "test_train_step", "test_parallel", "test_e2e_training", "test_model_parity",
    "test_golden_fixture",  # full-size f32 synthesis compile on CPU
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _FAST_MODULES:
            item.add_marker(pytest.mark.fast)
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
