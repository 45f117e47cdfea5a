"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is exercised on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) — the standard way JAX
codebases test SPMD without a real pod. The axon TPU plugin ignores the
``JAX_PLATFORMS`` env var, so the platform must be forced through
``jax.config`` before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running full-size tests (run by default; deselect with -m 'not slow')"
    )
