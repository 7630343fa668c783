"""Solver tests: tridiagonal, multigrid convergence, BiCGStab."""

import numpy as np
import jax
import jax.numpy as jnp

from somar_tpu.core.grid import Grid
from somar_tpu.core.bc import BC, FieldBCs
from somar_tpu.geometry.geo_source import CartesianMap, TwistedMap
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.solvers.tridiag import thomas_solve, vertical_poisson_nn
from somar_tpu.solvers.multigrid import (
    LevelMultigrid, MGParams, semicoarsening_schedule,
    restrict_fullweight, prolong_const)
from somar_tpu.solvers.bicgstab import bicgstab
from somar_tpu.solvers.poisson_op import PoissonOp


def test_thomas_matches_numpy():
    rng = np.random.default_rng(0)
    n, m = 16, 8
    a = rng.uniform(0.1, 0.5, (n, m))
    c = rng.uniform(0.1, 0.5, (n, m))
    b = 2.0 + a + c           # diagonally dominant
    d = rng.normal(size=(n, m))
    x = np.asarray(thomas_solve(*map(jnp.asarray, (a, b, c, d))))
    for col in range(m):
        A = np.diag(b[:, col]) + np.diag(a[1:, col], -1) + np.diag(c[:-1, col], 1)
        np.testing.assert_allclose(x[:, col], np.linalg.solve(A, d[:, col]),
                                   rtol=2e-4, atol=2e-4)


def test_vertical_poisson_nn():
    # d2x/dz2 = rhs with Neumann ends; manufactured x = cos(pi z), z in [0,1]
    n = 64
    dz = 1.0 / n
    z = (np.arange(n) + 0.5) * dz
    xexact = np.cos(np.pi * z)
    rhs = -(np.pi**2) * np.cos(np.pi * z)
    ones = np.ones((n + 1, 4))
    sol = vertical_poisson_nn(
        jnp.asarray(np.tile(rhs[:, None], (1, 4))),
        jnp.asarray(ones[:-1]), jnp.asarray(ones[1:]), dz)
    sol = np.asarray(sol)
    xe = xexact - xexact.mean()
    np.testing.assert_allclose(sol[:, 0], xe, atol=2e-3)


def test_semicoarsening_schedule_equalizes_anisotropy():
    # dx = (1, 16): vertical much finer -> coarsen vertical only at first
    g = Grid(nx=(8, 128), dx=(1.0, 1.0 / 16))
    sched = semicoarsening_schedule(g)
    assert sched[0] == (1, 2)
    assert sched[1] == (1, 2)
    # eventually isotropic
    assert (2, 2) in sched


def test_restrict_prolong_shapes():
    g = Grid(nx=(8, 4), dx=(0.125, 0.25))
    f = jnp.arange(32.0).reshape(4, 8)
    c = restrict_fullweight(f, g, (2, 2))
    assert c.shape == (2, 4)
    p = prolong_const(c, g, (2, 2))
    assert p.shape == (4, 8)
    np.testing.assert_allclose(np.asarray(restrict_fullweight(p, g, (2, 2))),
                               np.asarray(c))


def _mg_solve_error(n, geo=None, relax="gsrb", ndim=2, dtype=jnp.float32):
    g = Grid(nx=(n,) * ndim, dx=(1.0 / n,) * ndim, periodic=(True,) * ndim)
    lg = build_level_geometry(g, geo or CartesianMap(), dtype=dtype)
    bcs = FieldBCs.uniform(BC.periodic(), ndim)
    mg = LevelMultigrid(lg, bcs, params=MGParams(eps=1e-5, relax_mode=relax),
                        dtype=dtype)
    k = 2 * np.pi
    coords = g.coords()
    if geo is None:
        xph = [np.broadcast_to(c, g.shape) for c in coords]
    else:
        xph = [np.broadcast_to(geo.phys_coor(m, coords), g.shape)
               for m in range(ndim)]
    phase = sum(np.asarray(x) for x in xph)
    exact = np.sin(k * phase)
    rhs = -(ndim * k**2) * np.sin(k * phase) * ndim / ndim  # lap of sin(k sum x)
    # careful: lap sin(k(x+z)) = -ndim k^2 sin(...)
    phi, (iters, relres) = jax.jit(mg.solve)(jnp.asarray(rhs))
    phi = np.asarray(phi) - np.asarray(phi).mean()
    err = np.max(np.abs(phi - (exact - exact.mean())))
    return err, int(iters), float(relres)


def test_mg_cartesian_periodic_converges():
    err, iters, relres = _mg_solve_error(64)
    assert relres < 1e-4, (iters, relres)
    assert err < 5e-3, err          # discretization error ~ (k dx)^2


def test_mg_twisted_converges():
    geo = TwistedMap((0.04, 0.04), (1.0, 1.0))
    err, iters, relres = _mg_solve_error(32, geo=geo)
    assert relres < 1e-4, (iters, relres)
    assert err < 3e-2, err


def test_mg_anisotropic_grid_line_relax():
    # thin domain: nx=32, nz=32 but dx_z << dx_x (aspect 16)
    n = 32
    g = Grid(nx=(n, n), dx=(1.0 / n, 1.0 / (16 * n)), periodic=(True, True))
    lg = build_level_geometry(g, CartesianMap())
    bcs = FieldBCs.uniform(BC.periodic(), 2)
    mg = LevelMultigrid(lg, bcs, params=MGParams(eps=1e-5, relax_mode="line"))
    k = 2 * np.pi
    x, z = g.coords()
    # manufactured: phi = sin(k x) (constant in z) -> lap = -k^2 sin(kx)
    rhs = -(k**2) * np.sin(k * np.asarray(x)) * np.ones(g.shape)
    phi, (iters, relres) = jax.jit(mg.solve)(jnp.asarray(rhs))
    phi = np.array(phi)
    phi -= phi.mean()
    ex = np.sin(k * np.asarray(x)) * np.ones(g.shape)
    ex -= ex.mean()
    assert relres < 1e-4, (int(iters), relres)
    assert np.max(np.abs(phi - ex)) < 5e-3


def test_mg_dirichlet():
    n = 32
    g = Grid(nx=(n, n), dx=(1.0 / n,) * 2)
    lg = build_level_geometry(g, CartesianMap())
    bcs = FieldBCs.uniform(BC.dirichlet(0.0), 2)
    mg = LevelMultigrid(lg, bcs, params=MGParams(eps=1e-6))
    k = np.pi
    x, z = g.coords()
    exact = np.sin(k * np.asarray(x)) * np.sin(k * np.asarray(z))
    rhs = -2 * k**2 * exact
    phi, (iters, relres) = jax.jit(mg.solve)(jnp.asarray(rhs))
    assert relres < 1e-5
    assert np.max(np.abs(np.asarray(phi) - exact)) < 4e-3


def test_bicgstab_poisson():
    n = 32
    g = Grid(nx=(n, n), dx=(1.0 / n,) * 2, periodic=(True, True))
    lg = build_level_geometry(g, CartesianMap())
    bcs = FieldBCs.uniform(BC.periodic(), 2)
    op = PoissonOp(lg, bcs)
    k = 2 * np.pi
    x, z = g.coords()
    exact = np.sin(k * np.asarray(x)) * np.cos(k * np.asarray(z))
    rhs = -2 * k**2 * exact
    x_sol, (iters, relres) = jax.jit(
        lambda r: bicgstab(lambda v: op.apply(v), r, remove_mean=True))(
        jnp.asarray(rhs))
    assert relres < 1e-4, (int(iters), float(relres))
    sol = np.array(x_sol)
    sol -= sol.mean()
    assert np.max(np.abs(sol - (exact - exact.mean()))) < 5e-3


def _stretched_setup():
    from somar_tpu.geometry.geo_source import StretchedCartesianMap

    n = 64
    g = Grid(nx=(n, n), dx=(1.0 / n, 1.0 / n), periodic=(True, False))
    s = 4.0
    geo = StretchedCartesianMap(
        (lambda x: x,
         lambda z: (np.exp(s * z) - 1.0) / (np.exp(s) - 1.0)))
    lg = build_level_geometry(g, geo)
    bcs = FieldBCs(lo=(BC.periodic(), BC.neumann(0.0)),
                   hi=(BC.periodic(), BC.neumann(0.0)))
    x, z = g.coords()
    k = 2 * np.pi
    rhs = (np.sin(k * np.asarray(x)) * np.cos(np.pi * np.asarray(z))
           * np.ones(g.shape))
    return lg, bcs, jnp.asarray(rhs)


def test_mg_bicgstab_bottom_on_stretched_metric():
    """Krylov (BiCGStab) bottom solve (reference: AMRPressureSolver.cpp:
    253-287 registers BiCGStabSolver as the AMRMG bottom).  With a point
    (GSRB) smoother and limited MG depth on a terrain-like stretched
    vertical metric, the coarsest level keeps the full coefficient
    anisotropy: a smoothing-only bottom stalls an order of magnitude
    above where the Krylov bottom takes the same V-cycles.  (Round-3
    root cause note: the old single-uptick hang exit aborted the Krylov
    variant at cycle 2 because a BiCGStab bottom makes the outer residual
    history non-monotone; the outer loop now tracks the best iterate and
    requires two consecutive stalls.)"""
    lg, bcs, rhs = _stretched_setup()
    res = {}
    for bot in ("smooth", "bicgstab"):
        mg = LevelMultigrid(lg, bcs, params=MGParams(
            eps=1e-6, imax=12, max_depth=2, bottom_solver=bot,
            relax_mode="gsrb"))
        _, (iters, relres) = jax.jit(mg.solve)(rhs)
        res[bot] = float(relres)
    assert res["bicgstab"] < 5e-4, res
    assert res["smooth"] > 10 * res["bicgstab"], res


def test_mg_auto_line_smoother_on_stretched_metric():
    """The 'auto' smoother selection picks vertical line relaxation when
    the metric's vertical coupling dominates cellwise (reference:
    LineGSRB, GSRB.H:92 — the prescribed smoother for exactly this
    anisotropy), and MG then converges to the f32 floor in a dozen
    V-cycles where point-GSRB stalls two decades higher."""
    lg, bcs, rhs = _stretched_setup()
    mg = LevelMultigrid(lg, bcs, params=MGParams(
        eps=1e-6, imax=12, max_depth=2))
    assert mg.modes[0] == "line", mg.modes
    _, (iters, relres) = jax.jit(mg.solve)(rhs)
    assert float(relres) < 1e-4, (int(iters), float(relres))

    # isotropic Cartesian grids must keep the point smoother (the fused
    # Pallas GSRB fast path rides on it)
    g2 = Grid(nx=(32, 32), dx=(1 / 32, 1 / 32), periodic=(True, False))
    from somar_tpu.geometry.geo_source import CartesianMap
    mg2 = LevelMultigrid(build_level_geometry(g2, CartesianMap()), bcs,
                         params=MGParams())
    assert all(m == "gsrb" for m in mg2.modes), mg2.modes


def test_projector_solver_mux():
    """Solver mux (reference: AMRPressureSolver's static leptic/MG
    flags, AMRPressureSolver.cpp:39-40): 'auto' keeps the spectral fast
    path on uniform Cartesian grids and kernelized MG on mapped metrics
    (measured 15x faster than the leptic expansion on the BeamGeneration
    metric on TPU — see projector.py); the leptic solver remains
    available opt-in."""
    from somar_tpu.projection.projector import LevelProjector
    from somar_tpu.geometry.bathymetric import LedgeMap

    def ledge(Lx, nx=32, nz=8):
        g = Grid(nx=(nx, nz), dx=(Lx / nx, 1.0 / nz), x0=(-Lx / 2, 0.0))
        src = LedgeMap((0.0, 1.0), hl=0.5, hr=1.0, xl=-1.0, xr=1.0)
        return build_level_geometry(g, src)

    flat = LevelProjector(ledge(16.0))          # eps = (1/16)^2 ~ 0.004
    assert flat.method == "mg", flat.method
    opt_in = LevelProjector(ledge(16.0), method="leptic")
    assert opt_in.method == "leptic" and opt_in.leptic is not None
    g = Grid(nx=(32, 8), dx=(0.5, 0.125), periodic=(True, False))
    cart = LevelProjector(build_level_geometry(g, CartesianMap()))
    assert cart.method == "fft", cart.method
