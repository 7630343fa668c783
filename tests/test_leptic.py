"""Leptic solver tests: flat-domain Poisson correctness + fallback."""

import numpy as np
import jax
import jax.numpy as jnp

from somar_tpu.core.grid import Grid
from somar_tpu.core.bc import BC, FieldBCs
from somar_tpu.geometry.geo_source import CartesianMap
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.solvers.leptic import LevelLepticSolver, LepticParams
from somar_tpu.solvers.multigrid import LevelMultigrid, MGParams
from somar_tpu.utils.subspace import flatten_grid, vertical_integral, extrude


def _flat_domain(nx=64, nz=16, aspect=32.0):
    # L_x = aspect, H = 1: a leptic domain (H/L << 1)
    g = Grid(nx=(nx, nz), dx=(aspect / nx, 1.0 / nz),
             periodic=(True, False))
    lg = build_level_geometry(g, CartesianMap())
    bcs = FieldBCs(lo=(BC.periodic(), BC.neumann(0.0)),
                   hi=(BC.periodic(), BC.neumann(0.0)))
    return g, lg, bcs


def test_subspace_utils():
    g = Grid(nx=(8, 4), dx=(1.0, 0.25))
    h = flatten_grid(g)
    assert h.nx == (8,) and h.dx == (1.0,)
    f = jnp.ones(g.shape)
    vi = vertical_integral(f, g)
    np.testing.assert_allclose(np.asarray(vi), 1.0)   # 4 cells * 0.25
    e = extrude(vi, 4)
    assert e.shape == (4, 8)


def test_leptic_converges_on_flat_domain():
    g, lg, bcs = _flat_domain()
    solver = LevelLepticSolver(lg, bcs, LepticParams(eps=1e-5, max_order=10))
    kx = 2 * np.pi / g.domain_length(0)
    x, z = g.coords()
    exact = (np.sin(kx * np.asarray(x)) * np.ones(g.shape)
             + 0.1 * np.cos(np.pi * np.asarray(z)) * np.ones(g.shape))
    rhs = (-(kx**2) * np.sin(kx * np.asarray(x)) * np.ones(g.shape)
           - 0.1 * np.pi**2 * np.cos(np.pi * np.asarray(z)) * np.ones(g.shape))
    phi, (iters, relres, status) = jax.jit(solver.solve)(jnp.asarray(rhs))
    assert float(relres) < 1e-4, (int(iters), float(relres), int(status))
    p = np.array(phi)
    p -= p.mean()
    e = exact - exact.mean()
    assert np.max(np.abs(p - e)) < 5e-2 * np.max(np.abs(e))


def test_leptic_matches_mg_solution():
    g, lg, bcs = _flat_domain(nx=32, nz=8)
    solver = LevelLepticSolver(lg, bcs, LepticParams(eps=1e-6, max_order=12))
    mg = LevelMultigrid(lg, bcs, params=MGParams(eps=1e-7, imax=40,
                                                 relax_mode="line"))
    rng = np.random.default_rng(3)
    rhs = rng.normal(size=g.shape).astype(np.float32)
    rhs -= rhs.mean()
    p1, info1 = jax.jit(solver.solve_with_fallback)(jnp.asarray(rhs))
    p2, _ = jax.jit(mg.solve)(jnp.asarray(rhs))
    # both must actually satisfy the same equation (residual check — with a
    # random rhs in f32 the error floor is set by conditioning, so compare
    # residuals tightly and solutions loosely)
    r1 = float(solver.op.norm(solver.op.residual(p1, jnp.asarray(rhs))))
    r2 = float(solver.op.norm(solver.op.residual(p2, jnp.asarray(rhs))))
    rhs_norm = float(np.sqrt(np.mean(rhs**2)))
    assert r1 < 1e-3 * rhs_norm, r1
    assert r2 < 1e-3 * rhs_norm, r2
    a = np.array(p1)
    a -= a.mean()
    b = np.array(p2)
    b -= b.mean()
    scale = np.max(np.abs(b)) + 1e-12
    assert np.max(np.abs(a - b)) < 5e-2 * scale, np.max(np.abs(a - b)) / scale


def test_leptic_first_order_is_good_on_extreme_aspect():
    # aspect 256: the leptic expansion converges in very few orders
    g, lg, bcs = _flat_domain(nx=64, nz=8, aspect=256.0)
    solver = LevelLepticSolver(lg, bcs, LepticParams(eps=1e-4, max_order=6))
    kx = 2 * np.pi / g.domain_length(0)
    x, _ = g.coords()
    rhs = -(kx**2) * np.sin(kx * np.asarray(x)) * np.ones(g.shape)
    phi, (iters, relres, status) = jax.jit(solver.solve)(jnp.asarray(rhs))
    assert float(relres) < 1e-3
    # horizontal-only rhs: few outer orders (each runs a loose inner
    # horizontal MG, so "few" is <= 5 rather than 1)
    assert int(iters) <= 5, int(iters)


def test_ns_step_with_leptic_pressure_solver():
    """The projection.solver=2 knob routes the pressure solves through the
    leptic solver (reference: AMRPressureSolver's s_useAMRLepticSolver
    mux); one NS step on a flat domain must stay finite and projected."""
    from somar_tpu.config.parmparse import ParmParse
    from somar_tpu.config.context import ProblemContext
    from somar_tpu.driver import RunDriver

    cfg = """
    amr.nx = 48 8
    amr.nx_offset = -24 0
    amr.length = 15.0 1.0
    amr.isPeriodic = 0 0
    ibc.problem = 1
    amr.gravityMethod = 1
    amr.fixed_dt = 0.02
    amr.maxsteps = 2
    amr.final = 10.0
    amr.maxlevel = 0
    projection.solver = 2
    AMRMG.eps = 1e-5
    amr.verbosity = 0
    """
    ctx = ProblemContext.from_parmparse(ParmParse.from_string(cfg))
    assert ctx.ns.pressure_solver == "leptic"
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        driver = RunDriver(ctx, out_dir=td)
        assert driver.level.projector.method == "leptic"
        state, steps = driver.run(verbose=False)
    assert steps == 2
    assert np.all(np.isfinite(np.asarray(state.vel)))
    # approximate CC projection + loose leptic tolerance: bounded, not 0
    div = float(driver.level.max_divergence(state))
    assert div < 0.1, div


def test_leptic_on_mapped_terrain_metric():
    """Leptic solve on a terrain-following (non-diagonal Jgup) metric:
    the vertical/horizontal split uses the diagonal coefficients as a
    preconditioner, but convergence is driven by the FULL mapped
    operator's residual, and the BiCGStab fallback polishes whatever the
    expansion leaves (reference: LepticOperator consumes the full Jgup,
    LevelLepticSolver.H:41-52; Krylov branch LevelLepticSolver.cpp:
    851-874).  All other leptic tests use CartesianMap — this one runs
    the shelf-break LedgeMap."""
    from somar_tpu.geometry.bathymetric import LedgeMap

    Lx, nx, nz = 8.0, 48, 12
    g = Grid(nx=(nx, nz), dx=(Lx / nx, 1.0 / nz), x0=(-Lx / 2, 0.0))
    geo = build_level_geometry(g, LedgeMap((0.0, 1.0), hl=0.5, hr=1.0,
                                           xl=-1.0, xr=1.0))
    assert not geo.is_uniform and geo.Jgup_full is not None

    from somar_tpu.projection.projector import pressure_bcs
    bcs = pressure_bcs(g)
    solver = LevelLepticSolver(geo, bcs, LepticParams(eps=1e-5,
                                                      max_order=10))
    # smooth rhs (the leptic expansion's regime: horizontal scales ~ L);
    # rough/noise rhs is exactly what the Krylov fallback exists for
    x, z = g.coords()
    kx = 2 * np.pi / g.domain_length(0)
    rhs = jnp.asarray(np.sin(kx * np.asarray(x)) * np.ones(g.shape)
                      + 0.3 * np.cos(np.pi * np.asarray(z))
                      * np.ones(g.shape), jnp.float32)
    # pure-Neumann solvability on a mapped metric is the J-WEIGHTED mean
    # (physical projection rhs — a MAC divergence — satisfies it exactly
    # by telescoping; a manufactured rhs must be projected)
    rhs = solver.op.compat_project(rhs)

    # the plain expansion is outside its regime on this slope (the
    # neglected cross-metric coupling dominates): it must detect the
    # hang WITHOUT diverging (accept-if-better keeps the best iterate)
    from somar_tpu.solvers.leptic import LepticStatus
    phi, (iters, relres, status) = jax.jit(solver.solve)(rhs)
    assert float(relres) <= 1.0, (int(iters), float(relres), int(status))
    assert int(status) in (LepticStatus.CONVERGED, LepticStatus.ITER,
                           LepticStatus.HANG)

    # with the MG finisher the solve converges fully
    phi, (_, relres, _) = jax.jit(solver.solve_with_fallback)(rhs)
    r = solver.op.residual(phi, rhs)
    rel = float(solver.op.norm(r) / solver.op.norm(rhs))
    assert rel < 1e-3, rel

    # and matches the line-relaxed MG solution of the same problem
    from somar_tpu.solvers.multigrid import LevelMultigrid
    mg = LevelMultigrid(geo, bcs, params=MGParams(eps=1e-6, imax=30,
                                                  relax_mode="line"))
    phi_mg, _ = jax.jit(lambda r: mg.solve(r, singular=True))(rhs)
    a = np.asarray(phi) - float(jnp.mean(phi))
    b = np.asarray(phi_mg) - float(jnp.mean(phi_mg))
    scale = np.abs(b).max() + 1e-12
    assert np.max(np.abs(a - b)) / scale < 5e-2
