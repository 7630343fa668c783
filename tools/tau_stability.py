"""Root-cause experiment for the round-2 sync-projection tau instability.

Runs the 2-level lock exchange (the configuration that blew up by step
~60 in round 2 with tau enabled) under the four combinations of
{FAS tau, elliptic reflux} in the sync/VD composite solves and reports
max|u| / total-buoyancy drift over a long horizon.

Expected (and the fix's claim): tau WITHOUT reflux is the unstable
combination — the covered-cell equation is the fine operator's while the
adjacent uncovered cell still differences the coarse flux across the
shared face, so the composite solve chases a spurious interface source
each step; tau WITH reflux (reference parity: MappedAMRMultiGrid's
AMRVCycle is FAS + AMRResidual refluxes) is stable AND converges past the
Schwarz fixed point.

Usage: [STEPS=500] python tools/tau_stability.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp
import numpy as np

from somar_tpu.core.grid import Grid
from somar_tpu.geometry.geo_source import CartesianMap
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.physics.navier_stokes import NSParams
from somar_tpu.solvers.multigrid import MGParams
from somar_tpu.problems.lock_exchange import LockExchange
from somar_tpu.amr.hierarchy import AMRHierarchy
from somar_tpu.amr.tagging import TagParams


def run(use_tau: bool, use_reflux: bool, steps: int):
    Lx, Lz = 15.0, 2.0
    params = NSParams(nu=1e-4, kappa=(1e-4,), gravity_method=1,
                      mg=MGParams(eps=1e-6, imax=15))
    g0 = Grid(nx=(64, 16), dx=(Lx / 64, Lz / 16), x0=(-Lx / 2, 0.0))
    h = AMRHierarchy(build_level_geometry(g0, CartesianMap()),
                     LockExchange(pert_amp=0.0), params, ratio=(4, 1),
                     tag_params=TagParams(buoyancy_tag_tol=0.2,
                                          tags_grow=1),
                     sync_use_tau=use_tau, sync_use_reflux=use_reflux)
    s0 = h.level0.post_initialize(h.level0.initial_state())
    s1, origin = h.initial_patch_state(s0)
    step = jax.jit(h.advance)
    dt = jnp.asarray(0.02)
    blow_step = -1
    umax_hist = []
    for i in range(steps):
        s0, s1 = step(s0, s1, origin, dt)
        if (i + 1) % 10 == 0:
            s1, origin = h.regrid(s0, s1)
            umax = float(jnp.max(jnp.abs(s0.vel)))
            umax_hist.append(umax)
            if not np.isfinite(umax) or umax > 10.0:
                blow_step = i + 1
                break
    tag = f"tau={int(use_tau)} reflux={int(use_reflux)}"
    if blow_step > 0:
        print(f"{tag}: BLEW UP at step {blow_step} "
              f"(max|u| history {['%.3g' % u for u in umax_hist[-5:]]})")
    else:
        print(f"{tag}: stable through {steps} steps, "
              f"final max|u|={umax_hist[-1]:.4f}, "
              f"peak max|u|={max(umax_hist):.4f}")
    return blow_step, umax_hist


if __name__ == "__main__":
    steps = int(os.environ.get("STEPS", 500))
    for tau, rf in ((True, False), (True, True), (False, False),
                    (False, True)):
        run(tau, rf, steps)
