"""End-to-end NS validation on the Taylor-Green vortex (exact solution).

Reference analog: exec/inputs.TaylorGreen.machine + the exact-solution
kernels in TaylorGreenBCUtilF.ChF.
"""

import numpy as np
import jax
import jax.numpy as jnp

from somar_tpu.core.grid import Grid
from somar_tpu.geometry.geo_source import CartesianMap
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.physics.navier_stokes import NSLevel, NSParams
from somar_tpu.solvers.multigrid import MGParams
from somar_tpu.problems.taylor_green import TaylorGreen


def _run_tg(n, nsteps, dt, nu=0.0, u0=0.0):
    g = Grid(nx=(n, n), dx=(1.0 / n,) * 2, periodic=(True, True))
    lg = build_level_geometry(g, CartesianMap())
    prob = TaylorGreen(nu=nu, u0=u0)
    params = NSParams(nu=nu, kappa=(0.0,), gravity_method=0,
                      fixed_dt=dt, mg=MGParams(eps=1e-6, imax=25))
    level = NSLevel(lg, prob, params)
    state = level.post_initialize(level.initial_state())

    step = jax.jit(lambda s: level.advance(s, jnp.asarray(dt)))
    for _ in range(nsteps):
        state = step(state)
    exact = prob.vel_soln(lg, float(state.time))
    err = float(jnp.max(jnp.abs(state.vel - exact)))
    div = float(level.max_divergence(state))
    return err, div, state, level


def test_tg_inviscid_steady():
    """U0=0, nu=0: TG is a steady solution — the advection term is exactly
    balanced by pressure.  After N steps the error is discretization-level."""
    err, div, state, level = _run_tg(32, 10, dt=2.0e-3)
    assert err < 2e-2, err
    assert np.isfinite(err)


def test_tg_viscous_decay_convergence():
    nu = 1e-2
    T = 0.04
    e_c, _, _, _ = _run_tg(32, 8, dt=T / 8, nu=nu)
    e_f, _, _, _ = _run_tg(64, 16, dt=T / 16, nu=nu)
    order = np.log2(e_c / e_f)
    assert order > 1.3, (e_c, e_f, order)
    assert e_f < 5e-3, e_f


def test_tg_divergence_small():
    _, div, state, level = _run_tg(32, 5, dt=2e-3, nu=1e-3)
    # CC approximate projection: divergence bounded, not machine-zero
    assert div < 0.1, div
    assert np.all(np.isfinite(np.asarray(state.vel)))


def test_tg_translating():
    err, _, _, _ = _run_tg(48, 10, dt=1.5e-3, u0=1.0)
    assert err < 3e-2, err


def test_tg_rk3_scheme():
    """RK3 MOL integrator (reference: AMRNavierStokesAdvanceRK3) on the
    steady inviscid TG vortex."""
    import jax
    from somar_tpu.core.grid import Grid
    from somar_tpu.geometry.geo_source import CartesianMap
    from somar_tpu.geometry.level_geometry import build_level_geometry
    from somar_tpu.physics.navier_stokes import NSLevel, NSParams
    from somar_tpu.solvers.multigrid import MGParams
    from somar_tpu.problems.taylor_green import TaylorGreen

    n = 32
    g = Grid(nx=(n, n), dx=(1.0 / n,) * 2, periodic=(True, True))
    lg = build_level_geometry(g, CartesianMap())
    prob = TaylorGreen(nu=0.0)
    params = NSParams(nu=0.0, gravity_method=0, fixed_dt=2e-3,
                      update_scheme="rk3", mg=MGParams(eps=1e-6))
    level = NSLevel(lg, prob, params)
    state = level.post_initialize(level.initial_state())
    step = jax.jit(lambda s: level.advance(s, jnp.asarray(2e-3)))
    for _ in range(10):
        state = step(state)
    exact = prob.vel_soln(lg, float(state.time))
    err = float(jnp.max(jnp.abs(state.vel - exact)))
    assert err < 3e-2, err
    assert np.all(np.isfinite(np.asarray(state.vel)))


def test_tg_float64_convergence_anchor():
    """f64 validation anchor (the reference is all-f64): on the CPU
    backend with x64 enabled, the viscous TG error converges at 2nd order
    well below the f32 floor, pinning the discretization (not roundoff)
    as the error source."""
    jax.config.update("jax_enable_x64", True)
    try:
        nu = 1e-2
        T = 0.04

        def run(n, nsteps):
            g = Grid(nx=(n, n), dx=(1.0 / n,) * 2, periodic=(True, True))
            lg = build_level_geometry(g, CartesianMap(), dtype=jnp.float64)
            prob = TaylorGreen(nu=nu)
            params = NSParams(nu=nu, kappa=(0.0,), gravity_method=0,
                              fixed_dt=T / nsteps, dtype=jnp.float64,
                              mg=MGParams(eps=1e-11, imax=40))
            level = NSLevel(lg, prob, params)
            state = level.post_initialize(level.initial_state())
            step = jax.jit(lambda s: level.advance(
                s, jnp.asarray(T / nsteps, jnp.float64)))
            for _ in range(nsteps):
                state = step(state)
            exact = prob.vel_soln(lg, float(state.time))
            assert state.vel.dtype == jnp.float64
            return float(jnp.max(jnp.abs(state.vel - exact)))

        e_c = run(24, 6)
        e_f = run(48, 12)
        order = np.log2(e_c / e_f)
        assert order > 1.6, (e_c, e_f, order)
        # far below the ~1e-3 f32 floor: errors are discretization only
        assert e_f < 2e-3, e_f
    finally:
        jax.config.update("jax_enable_x64", False)


def test_tg_rk3_implicit_viscosity_beyond_explicit_limit():
    """RK3 per-stage implicit viscous solves stay stable at a dt well
    beyond the explicit diffusive limit dt_exp = dx^2/(4 nu) (reference:
    updateState's per-stage TGA solves,
    AMRNavierStokesAdvanceRK3.cpp:903,933)."""
    import jax
    from somar_tpu.core.grid import Grid
    from somar_tpu.geometry.geo_source import CartesianMap
    from somar_tpu.geometry.level_geometry import build_level_geometry
    from somar_tpu.physics.navier_stokes import NSLevel, NSParams
    from somar_tpu.solvers.multigrid import MGParams
    from somar_tpu.problems.taylor_green import TaylorGreen

    n = 32
    nu = 0.5                      # dt_exp = (1/32)^2/(4*0.5) ~ 4.9e-4
    dt = 5e-3                     # ~10x beyond the explicit limit
    g = Grid(nx=(n, n), dx=(1.0 / n,) * 2, periodic=(True, True))
    lg = build_level_geometry(g, CartesianMap())
    prob = TaylorGreen(nu=nu)
    params = NSParams(nu=nu, gravity_method=0, fixed_dt=dt,
                      update_scheme="rk3", mg=MGParams(eps=1e-6))
    level = NSLevel(lg, prob, params)
    state = level.post_initialize(level.initial_state())
    step = jax.jit(lambda s: level.advance(s, jnp.asarray(dt)))
    e0 = float(jnp.sum(state.vel * state.vel))
    for _ in range(10):
        state = step(state)
    vel = np.asarray(state.vel)
    assert np.all(np.isfinite(vel))
    # strong decay (exp(-2 nu k^2 t) with k=2pi: factor ~ 1e-17 at t=0.05
    # — any explicit-diffusion instability would blow up instead)
    e1 = float(jnp.sum(state.vel * state.vel))
    assert e1 < 0.05 * e0, (e0, e1)


def test_tg_on_twisted_map_second_order():
    """Mapped-operator ACCURACY anchor: the exact Taylor-Green solution
    on the sinusoidally distorted TwistedMap (non-diagonal Jgup,
    solver-stress map per the reference) converges at 2nd order —
    measured order 2.04 (e24 = 7.0e-3, e48 = 1.7e-3).  This validates
    the whole mapped pipeline (metric fills, basis transforms, mapped
    traces, MAC/CC projections on the full Jgup) against a known
    physical solution, not just manufactured operators."""
    from somar_tpu.geometry.geo_source import TwistedMap

    def run(n, nsteps, dt):
        g = Grid(nx=(n, n), dx=(1.0 / n,) * 2, periodic=(True, True))
        lg = build_level_geometry(g, TwistedMap((0.05, 0.05), (1.0, 1.0)))
        prob = TaylorGreen(nu=0.0)
        params = NSParams(nu=0.0, kappa=(0.0,), gravity_method=0,
                          fixed_dt=dt, mg=MGParams(eps=1e-7, imax=30))
        level = NSLevel(lg, prob, params)
        state = level.post_initialize(level.initial_state())
        step = jax.jit(lambda s: level.advance(s, jnp.asarray(dt)))
        for _ in range(nsteps):
            state = step(state)
        exact = prob.vel_soln(lg, float(state.time))
        return float(jnp.max(jnp.abs(state.vel - exact)))

    T = 0.02
    e_c = run(24, 8, T / 8)
    e_f = run(48, 16, T / 16)
    order = np.log2(e_c / e_f)
    assert order > 1.6, (e_c, e_f, order)
    assert e_f < 4e-3, e_f


def test_tg_amr_composite_second_order():
    """AMR COMPOSITE accuracy anchor: the exact Taylor-Green vortex on a
    2-level hierarchy (centered 2x patch; subcycled advance, CF rings,
    average-down, composite sync projection) converges at >= 2nd order
    in the composite coarse field (measured order 2.9: e24 = 1.6e-3,
    e48 = 2.1e-4) — the coarse-fine interface does not degrade the
    solution order."""
    from somar_tpu.amr.hierarchy import AMRHierarchy
    from somar_tpu.amr.tagging import TagParams

    def run(n, nsteps, dt):
        g = Grid(nx=(n, n), dx=(1.0 / n,) * 2, periodic=(True, False))
        lg = build_level_geometry(g, CartesianMap())
        prob = TaylorGreen(nu=0.0)
        params = NSParams(nu=0.0, kappa=(0.0,), gravity_method=0,
                          fixed_dt=dt, mg=MGParams(eps=1e-7, imax=30))
        h = AMRHierarchy(lg, prob, params, ratio=(2, 2), patch_frac=0.5,
                         tag_params=TagParams())  # no tags -> centered
        s0 = h.level0.post_initialize(h.level0.initial_state())
        s1, origin = h.initial_patch_state(s0)
        step = jax.jit(h.advance)
        for _ in range(nsteps):
            s0, s1 = step(s0, s1, origin, jnp.asarray(dt))
        exact = prob.vel_soln(lg, float(s0.time))
        return float(jnp.max(jnp.abs(s0.vel - exact)))

    T = 0.02
    e_c = run(24, 8, T / 8)
    e_f = run(48, 16, T / 16)
    order = np.log2(e_c / e_f)
    assert order > 1.6, (e_c, e_f, order)
    assert e_f < 1e-3, e_f
