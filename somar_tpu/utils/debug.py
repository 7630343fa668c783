"""Debug / safety nets: NaN sweeps, bogus-value poisoning, state checks.

Re-design of the reference's Debug.H (`/root/reference/src/utils/Debug.H`:
nanCheck/checkForValidNAN :132-135, bogus-value initialization
DEBUG_BOOL/s_set_bogus_values AMRNavierStokes.H:696) — the TPU analogs
(SURVEY.md section 5.2): jax.debug_nans-style sweeps that work inside jit
via checkify-free `jnp.isfinite` reductions + host callbacks, and
poison-fill of freshly allocated fields so reads of unset data explode
visibly.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

#: the reference's quiet-NaN-like sentinel (ProblemContext.H:108)
BOGUS_VALUE = 1.0e300 if os.environ.get("SOMAR_F64") else 1.0e30

#: enable per-stage NaN sweeps (reference: debug builds check after every
#: substep, AMRNavierStokesAdvancePPM.cpp:92-103)
CHECKS_ENABLED = os.environ.get("SOMAR_DEBUG_CHECKS", "0") == "1"


def bogus_like(x):
    """Poison-filled array (reads of unset data become obvious)."""
    return jnp.full_like(x, BOGUS_VALUE)


def nan_check(x, name: str = "field"):
    """Inside-jit NaN/Inf sweep; prints through a debug callback when
    enabled (zero cost when disabled — the branch is trace-time)."""
    if not CHECKS_ENABLED:
        return x
    from somar_tpu.utils.printing import supports_host_callbacks
    if not supports_host_callbacks():
        return x
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))

    def report(bad_val):
        if bool(bad_val):
            print(f"somar_tpu NaN check FAILED: {name}")

    jax.debug.callback(report, bad)
    return x


def check_state(state, where: str = ""):
    """Sweep every field of an NSState (reference: checkForValidNAN on
    each substep output)."""
    if not CHECKS_ENABLED:
        return state
    for fname in ("vel", "scalars", "lam", "mac_phi", "cc_phi", "pressure"):
        nan_check(getattr(state, fname), f"{where}:{fname}")
    return state


def assert_finite_host(x, name: str = "field"):
    """Host-side hard assertion (test/driver use, not inside jit)."""
    import numpy as np

    arr = np.asarray(x)
    if not np.all(np.isfinite(arr)):
        n_bad = int(np.sum(~np.isfinite(arr)))
        raise FloatingPointError(
            f"{name}: {n_bad}/{arr.size} non-finite values")
    return x
