"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is exercised on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``) — the standard way JAX
codebases test SPMD without a real pod. Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
