"""RK3 method-of-lines time integrator (alternative to the PPM scheme).

Re-design of the reference's AMRNavierStokesAdvanceRK3.cpp (:57-145
RK3TimeStep, :146 computeMOLSources, :776 updateState): a 3-stage SSP
Runge-Kutta (Shu-Osher form) over the MOL right-hand side

  R(u) = -div(u (x) u_adv) + grav + tidal + sponge + nu L u,
  R(b) = -div(b u_adv) + background + kappa L b,

with a MAC projection of the advecting velocity and a CC projection of
the velocity each stage (reference projects per stage at :903,933).
Spatial fluxes reuse the Godunov face reconstruction at dt -> 0 (pure
upwind PPM faces, no characteristic time-centering — the RK stages supply
the time accuracy).

Selected via NSParams.update_scheme = "rk3" (reference: amr.updateScheme,
ProblemContext.H:295).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from somar_tpu.core.bc import apply_fc_bc
from somar_tpu.ops.stencil import cc_to_fc
from somar_tpu.physics.godunov import flux_divergence, trace_face_states
from somar_tpu.physics.navier_stokes import NSState


def _mol_rhs(level, state: NSState, grad_p, dt_for_sponge,
             collect=None, ring_mac=None):
    """The MOL right-hand side for (vel, scalars, lam).  With `collect`
    (a dict), the stage's advective interface fluxes J u^d s are stored
    under collect["vel"/"scalars"/"lam"] for AMR refluxing (reference:
    the RK3 path increments flux registers too,
    AMRNavierStokesAdvanceRK3.cpp:416-446,518)."""
    p = level.params
    grid = level.grid
    geo = level.geo
    ndim = grid.ndim

    u_mapped = geo.to_mapped(state.vel)
    # advecting velocity: face-averaged J u^d, MAC projected
    adv = []
    for d in range(ndim):
        f = cc_to_fc(geo.mult_by_J(u_mapped[d]), d, grid,
                     level.vel_bcs_trace[d])
        adv.append(apply_fc_bc(f, d, grid, level.vel_bcs_trace[d]))
    if p.is_incompressible:
        adv, _, _ = level.projector.project_mac(tuple(adv),
                                                phi0=state.mac_phi,
                                                ring=ring_mac)
        adv = tuple(apply_fc_bc(adv[d], d, grid, level.vel_bcs_trace[d])
                    for d in range(ndim))
    adv = tuple(adv)

    zero_dt = jnp.zeros((), state.vel.dtype)

    def upwind_div(s, bcs, params):
        faces = trace_face_states(s, u_mapped, adv, None, zero_dt, geo,
                                  bcs, params, vel_bcs=level.vel_bcs_trace)
        div = flux_divergence(faces, adv, geo)
        if collect is None:
            return div
        return div, tuple(faces[d] * adv[d] for d in range(ndim))

    grav = level._gravity_source(state.scalars)
    sponge_v, sponge_s = level._sponge_source(state.vel, state.scalars,
                                              dt_for_sponge)
    # viscosity/diffusion are NOT part of the explicit RHS when the level
    # owns implicit heat solvers: each RK stage runs its own implicit
    # solve instead (reference: updateState's per-stage TGA solves,
    # AMRNavierStokesAdvanceRK3.cpp:903,933)
    visc = None if level.is_viscous else level._viscous_source(state.vel)

    dvel = []
    vel_fluxes = []
    for m in range(ndim):
        r = upwind_div(state.vel[m], level.vel_bcs_trace[m],
                       p.advection_vel)
        if collect is not None:
            r, fl = r
            vel_fluxes.append(fl)
        r = -r
        r = r + grav[m]
        if grad_p is not None:
            r = r - grad_p[m]
        if visc is not None:
            r = r + visc[m]
        if sponge_v is not None:
            r = r + sponge_v[m]
        dvel.append(r)

    if collect is not None:
        collect["vel"] = tuple(vel_fluxes)
    dscal = []
    scal_fluxes = []
    for c in range(level.problem.num_scalars):
        r = upwind_div(state.scalars[c], level.scal_bcs, p.advection_scal)
        if collect is not None:
            r, fl = r
            scal_fluxes.append(fl)
        r = -r
        if c == 0 and level._nsq_cc is not None:
            r = r + state.vel[ndim - 1] * level._nsq_cc
        if c == 0 and sponge_s is not None:
            r = r + sponge_s
        dscal.append(r)

    if collect is not None:
        collect["scalars"] = tuple(scal_fluxes)
    dlam = upwind_div(state.lam, level.lam_bcs, p.advection_scal)
    if collect is not None:
        dlam, fl = dlam
        collect["lam"] = fl
    dlam = -dlam
    return jnp.stack(dvel), jnp.stack(dscal), dlam


def advance_rk3(level, state: NSState, dt, collect=None,
                rings=None) -> NSState:
    """One SSP-RK3 step with per-stage projection and per-stage implicit
    viscous/diffusive solves (reference: RK3TimeStep + updateState's TGA
    solve per stage, AMRNavierStokesAdvanceRK3.cpp:57-145,903,933).

    collect: optional dict filled with the step-effective advective
    interface fluxes for AMR refluxing — the Shu-Osher expansion gives
    the stage fluxes weights (1/6, 1/6, 2/3).
    rings: optional dict(mac=..., cc=...) of coarse-fine ghost-potential
    arrays (AMR patch levels), applied to every stage's projections."""
    import jax

    p = level.params
    grad_p = (level.projector.cc_grad_cart(state.pressure)
              if p.is_incompressible else None)
    ring_mac = rings.get("mac") if rings else None
    ring_cc = rings.get("cc") if rings else None
    stage_collects = [] if collect is not None else None

    def stage(s: NSState, w_old: float, w_new: float):
        sc = {} if collect is not None else None
        dv, ds, dl = _mol_rhs(level, s, grad_p, dt, collect=sc,
                              ring_mac=ring_mac)
        if sc is not None:
            stage_collects.append(sc)
        vel = w_old * state.vel + w_new * (s.vel + dt * dv)
        scal = w_old * state.scalars + w_new * (s.scalars + dt * ds)
        lam = w_old * state.lam + w_new * (s.lam + dt * dl)
        # implicit stage solves over the stage's effective dt = w_new*dt
        # (the Shu-Osher convex combination scales the stage increment)
        dt_eff = w_new * dt
        if level.is_viscous:
            vel = jnp.stack([
                level.visc_solvers[m].update(vel[m], None, dt_eff)[0]
                for m in range(level.grid.ndim)])
        new_scal = []
        for c in range(level.problem.num_scalars):
            if level.diff_solvers[c] is not None:
                new_scal.append(
                    level.diff_solvers[c].update(scal[c], None, dt_eff)[0])
            else:
                new_scal.append(scal[c])
        scal = jnp.stack(new_scal)
        cc_phi = s.cc_phi
        if p.is_incompressible:
            vel, cc_phi, _ = level.projector.project_cc(
                vel, level.vel_bcs_trace, phi0=s.cc_phi, ring=ring_cc)
        return dataclasses.replace(s, vel=vel, scalars=scal, lam=lam,
                                   cc_phi=cc_phi)

    s1 = stage(state, 0.0, 1.0)
    s2 = stage(s1, 0.75, 0.25)
    s3 = stage(s2, 1.0 / 3.0, 2.0 / 3.0)

    if collect is not None:
        # u^{n+1} = u^n + dt*(R0/6 + R1/6 + 2 R2/3): the effective flux
        # through each interface is the same convex combination
        ws = (1.0 / 6.0, 1.0 / 6.0, 2.0 / 3.0)
        acc = jax.tree_util.tree_map(
            lambda a, b, c: ws[0] * a + ws[1] * b + ws[2] * c,
            *stage_collects)
        collect.update(acc)

    pressure = state.pressure
    if p.is_incompressible:
        pressure = state.pressure + s3.cc_phi / dt
    return dataclasses.replace(s3, pressure=pressure,
                               time=state.time + dt)
