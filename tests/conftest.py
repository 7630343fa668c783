"""Test configuration: CPU backend, single device.

Multi-chip sharding tests spawn subprocesses that set
xla_force_host_platform_device_count themselves (see test_sharding.py) —
forcing 8 virtual devices in-process would oversubscribe the 1-core CI
host for every test.  The driver separately validates the multi-chip path
via __graft_entry__.dryrun_multichip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
