"""Test configuration: run on a virtual 8-device CPU mesh.

Tests never require real TPU hardware; sharding tests use
xla_force_host_platform_device_count (the TPU analog of the reference's
serial-vs-mpirun equivalence checks, SURVEY.md section 4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
