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
