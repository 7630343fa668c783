"""Derived diagnostic fields.

Re-design of AMRNavierStokesDerive.cpp
(`/root/reference/src/NavierStokes/AMRNavierStokesDerive.cpp`):
computeLapVel, computeVorticity (-> ops.stencil.vorticity),
computeStreamFunction (:  Poisson solve for psi with omega as source),
computeRiNumber (-> utils.strat.gradient_richardson_number),
totalEnergy (:512, kernel COMPUTEENERGY -> NSLevel.total_energy).
"""

from __future__ import annotations

import jax.numpy as jnp

from somar_tpu.core.bc import BC, FieldBCs
from somar_tpu.ops.stencil import vorticity
from somar_tpu.utils.strat import gradient_richardson_number


def compute_vorticity(level, state):
    return vorticity(state.vel, level.geo,
                     [level.vel_bcs_trace[m] for m in range(level.grid.ndim)])


def compute_stream_function(level, state):
    """2D streamfunction psi: lap(psi) = -omega, psi = 0 gauge
    (reference: computeStreamFunction — a Poisson solve)."""
    grid = level.grid
    assert grid.ndim == 2, "streamfunction is a 2D diagnostic"
    w = compute_vorticity(level, state)
    rhs = -w
    psi, _ = level.projector._solve(rhs - jnp.mean(rhs))
    return psi - jnp.mean(psi)


def compute_lap_vel(level, state):
    """Vector Laplacian of the Cartesian velocity per component
    (reference: computeLapVel via VelocityAMRPoissonOp)."""
    return jnp.stack([
        level._visc_ops[m].apply(state.vel[m], 0.0, 1.0, homogeneous=False)
        for m in range(level.grid.ndim)])


def compute_ri_number(level, state):
    """Gradient Richardson number of the total buoyancy (reference:
    computeRiNumber + StratUtils::computeGradRiNumber)."""
    b_total = state.scalars[0]
    if level.problem.use_background_scalar:
        b_total = b_total + level.problem.background_cc(level.geo)
    return gradient_richardson_number(state.vel, b_total, level.geo)


def kinetic_energy(level, state):
    """Volume-integrated 0.5|u|^2 J dV (reference: COMPUTEKINETICENERGY)."""
    import numpy as np

    ke = 0.5 * jnp.sum(state.vel * state.vel, axis=0)
    dv = float(np.prod(level.grid.dx))
    return jnp.sum(ke * level.geo.J) * dv
