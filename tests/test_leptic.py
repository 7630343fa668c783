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
