"""Probed-stencil mapped-metric GSRB / residual kernels vs the jnp
PoissonOp reference (ops/stencil_gsrb_pallas.py).

The plan extracts the exact interior stencil of alpha + beta*Jinv*
div(Jgup grad) — including the BC ghost folds and the non-diagonal
cross-term handling — by probing the jnp operator with lattice-coloring
fields.  These tests assert: (a) the reconstruction is exact on diagonal
(stretched) and non-diagonal (terrain-following / twisted) metrics,
(b) the fused sweeps/residual match PoissonOp.relax_gsrb/residual to
roundoff in interpret mode, small and slab variants, (c) MG convergence
on a mapped metric is unchanged with the fused path, (d) the gate falls
back where the probe cannot represent the stencil.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from somar_tpu.core.bc import BC, FieldBCs
from somar_tpu.core.grid import Grid
from somar_tpu.geometry.bathymetric import LedgeMap
from somar_tpu.geometry.geo_source import (StretchedCartesianMap,
                                           TwistedMap)
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.ops import stencil_gsrb_pallas as sp
from somar_tpu.solvers.poisson_op import PoissonOp


def _stretched(nx, periodic, lo, hi):
    s = 3.0
    maps = [lambda x: x] * (len(nx) - 1) + [
        lambda z: (np.exp(s * z) - 1.0) / (np.exp(s) - 1.0)]
    grid = Grid(nx=nx, dx=tuple(1.0 / n for n in nx), periodic=periodic)
    geo = build_level_geometry(grid, StretchedCartesianMap(tuple(maps)))
    return grid, geo, FieldBCs(lo=lo, hi=hi)


def _ledge(nx, periodic, lo, hi):
    grid = Grid(nx=nx, dx=tuple(2.0 / n for n in nx),
                x0=(-1.0,) * (len(nx) - 1) + (0.0,), periodic=periodic)
    geo_src = LedgeMap((0.0, 1.0), hl=0.5, hr=1.0, xl=-0.5, xr=0.5)
    geo = build_level_geometry(grid, geo_src)
    return grid, geo, FieldBCs(lo=lo, hi=hi)


def _twisted(nx, periodic, lo, hi):
    grid = Grid(nx=nx, dx=tuple(1.0 / n for n in nx), periodic=periodic)
    geo = build_level_geometry(
        grid, TwistedMap((0.07,) * len(nx), (1.0,) * len(nx)))
    return grid, geo, FieldBCs(lo=lo, hi=hi)


CASES = [
    # diagonal array-coefficient metric, mixed BCs, 2D
    (_stretched, (24, 32), (True, False),
     (BC.periodic(), BC.neumann()), (BC.periodic(), BC.dirichlet())),
    # non-diagonal terrain-following metric (the beam/ledge family), 2D
    (_ledge, (32, 24), (False, False),
     (BC.neumann(), BC.neumann()), (BC.neumann(), BC.neumann())),
    # non-diagonal with periodic horizontal + CF/extrap edges
    (_twisted, (24, 16), (True, False),
     (BC.periodic(), BC.cf()), (BC.periodic(), BC.extrap(0))),
    # diagonal 3D
    (_stretched, (16, 12, 16), (True, True, False),
     (BC.periodic(), BC.periodic(), BC.neumann()),
     (BC.periodic(), BC.periodic(), BC.neumann())),
    # non-diagonal 3D terrain
    (_ledge, (12, 8, 12), (False, True, False),
     (BC.neumann(), BC.periodic(), BC.neumann()),
     (BC.dirichlet(), BC.periodic(), BC.neumann())),
]


def _build(case, monkeypatch, budget=None):
    make, nx, periodic, lo, hi = case
    if budget is not None:
        monkeypatch.setattr(sp, "_VMEM_BUDGET", budget)
    grid, geo, bcs = make(nx, periodic, lo, hi)
    monkeypatch.setenv("SOMAR_FUSED_GSRB", "0")
    op_ref = PoissonOp(geo, bcs)
    plan = sp.build_stencil_plan(op_ref)
    rng = np.random.RandomState(3)
    phi = jnp.asarray(rng.randn(*grid.shape), jnp.float32)
    rhs = jnp.asarray(rng.randn(*grid.shape), jnp.float32)
    return op_ref, plan, phi, rhs


@pytest.mark.parametrize("case", CASES)
def test_probe_reconstruction_exact(case, monkeypatch):
    op, plan, phi, _ = _build(case, monkeypatch)
    assert plan is not None
    want = np.asarray(op.apply(phi, 0.0, 1.0))
    got = np.asarray(sp._apply_reference(plan, phi))
    scale = np.abs(want).max() + 1e-30
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-6)


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("variant", ["small", "slab"])
def test_gsrb_and_residual_match_jnp(case, variant, monkeypatch):
    budget = None
    if variant == "slab":
        # force the slab path: shrink the budget just below this case's
        # small-variant working set (which depends on the probed K)
        _, plan0, _, _ = _build(case, monkeypatch)
        assert plan0 is not None
        ncell = int(np.prod(plan0.shape))
        budget = 4 * ncell * (plan0.K + 10) - 1
    op, plan, phi, rhs = _build(case, monkeypatch, budget=budget)
    if variant == "slab":
        if plan is None:
            pytest.skip("slab variant unavailable on this shape")
        assert plan.mode == "slab"
    else:
        assert plan is not None and plan.mode == "small"
    alpha, beta = 0.4, 1.7
    for iters in (1, 3):
        ref = op.relax_gsrb(phi, rhs, alpha, beta, iters)
        got = sp.gsrb_sweeps(plan, phi, rhs, alpha, beta, iters,
                             interpret=True)
        scale = np.abs(np.asarray(ref)).max() + 1e-30
        np.testing.assert_allclose(np.asarray(got) / scale,
                                   np.asarray(ref) / scale, atol=2e-5)
    rres = op.residual(phi, rhs, alpha, beta)
    gres = sp.helm_residual(plan, phi, rhs, alpha, beta, interpret=True)
    scale = np.abs(np.asarray(rres)).max() + 1e-30
    np.testing.assert_allclose(np.asarray(gres) / scale,
                               np.asarray(rres) / scale, atol=2e-5)


def test_poisson_op_uses_stencil_plan(monkeypatch):
    """With the fused gate on, a mapped-metric PoissonOp builds the probed
    plan and relax/residual ride it (interpret mode on CPU)."""
    make, nx, periodic, lo, hi = CASES[1]
    grid, geo, bcs = make(nx, periodic, lo, hi)
    monkeypatch.setenv("SOMAR_FUSED_GSRB", "1")
    op = PoissonOp(geo, bcs)
    assert op._fused_plan is None and op._stencil_plan is not None
    monkeypatch.setenv("SOMAR_FUSED_GSRB", "0")
    op_ref = PoissonOp(geo, bcs)
    rng = np.random.RandomState(5)
    phi = jnp.asarray(rng.randn(*grid.shape), jnp.float32)
    rhs = jnp.asarray(rng.randn(*grid.shape), jnp.float32)
    ref = op_ref.relax_gsrb(phi, rhs, 0.0, 1.0, 2)
    got = op.relax_gsrb(phi, rhs, 0.0, 1.0, 2)
    scale = np.abs(np.asarray(ref)).max() + 1e-30
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(ref) / scale, atol=2e-5)


def test_mg_convergence_with_stencil_plan(monkeypatch):
    """A mapped-metric MG solve converges identically (iter count, residual
    class) with the fused stencil path enabled."""
    from somar_tpu.solvers.multigrid import LevelMultigrid, MGParams

    make, nx, periodic, lo, hi = CASES[1]
    grid, geo, bcs = make(nx, periodic, lo, hi)
    x = grid.cc_coord_1d(0)[None, :] * np.ones(grid.shape)
    z = grid.cc_coord_1d(1)[:, None] * np.ones(grid.shape)
    rhs = jnp.asarray(np.sin(2 * np.pi * x) * np.cos(np.pi * z), jnp.float32)
    results = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("SOMAR_FUSED_GSRB", flag)
        mg = LevelMultigrid(geo, bcs, params=MGParams(eps=1e-6, imax=20))
        phi, (iters, relres) = mg.solve(rhs)
        results[flag] = (int(iters), float(relres), np.asarray(phi))
    assert results["1"][1] < 1e-5
    assert abs(results["1"][0] - results["0"][0]) <= 1
    scale = np.abs(results["0"][2]).max() + 1e-30
    np.testing.assert_allclose(results["1"][2] / scale,
                               results["0"][2] / scale, atol=1e-4)


def test_extrap_bc_plan_gate(monkeypatch):
    """Order-1 extrapolation folds to offsets <= 1 (ghost = 2 s0 - s1, so
    the boundary row reads s0, s1) — representable, and the plan must
    validate.  Order-2 extrapolation reaches stencil offset 2 (ghost =
    3 s0 - 3 s1 + s2) — the 3^nd probe cannot represent it and validation
    must reject the plan."""
    make, nx, periodic, _, hi = CASES[0]
    monkeypatch.setenv("SOMAR_FUSED_GSRB", "0")

    lo = (BC.periodic(), BC.extrap(1))
    grid, geo, bcs = make(nx, periodic, lo, hi)
    op = PoissonOp(geo, bcs)
    plan = sp.build_stencil_plan(op)
    assert plan is not None
    rng = np.random.RandomState(7)
    phi = jnp.asarray(rng.randn(*grid.shape), jnp.float32)
    want = np.asarray(op.apply(phi, 0.0, 1.0))
    got = np.asarray(sp._apply_reference(plan, phi))
    scale = np.abs(want).max() + 1e-30
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-6)

    lo2 = (BC.periodic(), BC.extrap(2))
    grid2, geo2, bcs2 = make(nx, periodic, lo2, hi)
    op2 = PoissonOp(geo2, bcs2)
    assert sp.build_stencil_plan(op2) is None


def test_delta_weights_match_jnp(monkeypatch):
    """Runtime delta weights (the implicit-gravity altered metric,
    AlteredMetric.H:34-56): delta_stencil_weights evaluates the
    jgup_delta contribution at the plan's probed offsets inside the
    trace, and the kernels take the combined weights as operands — the
    fused path then reproduces the jnp operator WITH the delta to
    roundoff (residual and smoother)."""
    case = CASES[1]          # ledge: non-diagonal 2D, all Neumann
    op, plan, phi, rhs = _build(case, monkeypatch)
    assert plan is not None and plan.K == 3 ** plan.ndim - 1
    grid = op.grid
    rng = np.random.RandomState(7)
    diag, full = [], []
    for d in range(grid.ndim):
        fs = grid.fc_shape(d)
        diag.append(jnp.asarray(-0.1 * rng.rand(*fs), jnp.float32))
        full.append(jnp.asarray(
            0.05 * rng.randn(grid.ndim, *fs), jnp.float32))
    jd = (tuple(diag), tuple(full))

    got = sp.delta_stencil_weights(plan, op, jd)
    assert got is not None
    dWn, dR = got
    alpha, beta = 0.4, 1.7

    rres = op.residual(phi, rhs, alpha, beta, jgup_delta=jd)
    gres = sp.helm_residual(plan, phi, rhs, alpha, beta, interpret=True,
                            Wn=plan.Wn + dWn, R=plan.R + dR)
    scale = np.abs(np.asarray(rres)).max() + 1e-30
    np.testing.assert_allclose(np.asarray(gres) / scale,
                               np.asarray(rres) / scale, atol=2e-5)

    for iters in (1, 3):
        ref = op.relax_gsrb(phi, rhs, alpha, beta, iters, jgup_delta=jd)
        got2 = sp.gsrb_sweeps(plan, phi, rhs, alpha, beta, iters,
                              interpret=True, Wn=plan.Wn + dWn,
                              R=plan.R + dR,
                              w0=op.diag(0.0, 1.0, jd))
        scale = np.abs(np.asarray(ref)).max() + 1e-30
        np.testing.assert_allclose(np.asarray(got2) / scale,
                                   np.asarray(ref) / scale, atol=2e-5)

    # the delta weights work under jit with a TRACED delta scale (the
    # IG projection's dt*theta is traced)
    import jax as _jax

    def f(s):
        jds = ((tuple(s * x for x in diag)),
               (tuple(s * x for x in full)))
        g2 = sp.delta_stencil_weights(plan, op, jds)
        return sp.helm_residual(plan, phi, rhs, alpha, beta,
                                interpret=True, Wn=plan.Wn + g2[0],
                                R=plan.R + g2[1])
    out = _jax.jit(f)(jnp.float32(1.0))
    # scale by the RESIDUAL's magnitude (the loop above reassigned `scale`
    # to the much smaller relax iterate's, which tightened the tolerance
    # ~25x past f32 roundoff — host-SIMD-order marginal)
    scale = np.abs(np.asarray(rres)).max() + 1e-30
    np.testing.assert_allclose(np.asarray(out) / scale,
                               np.asarray(rres) / scale, atol=2e-5)


def test_mg_ig_solve_rides_delta_kernels(monkeypatch):
    """The implicit-gravity MG solve (traced jgup_deltas) takes the
    probed-stencil kernel path: LevelMultigrid hoists
    PoissonOp.delta_kernel_overrides once per solve and relax/residual
    ride the kernels with runtime weights.  Convergence must match the
    jnp path (same V-cycle count +-1, same answer)."""
    from somar_tpu.projection.altered_metric import AlteredMetric
    from somar_tpu.problems.base import LinearProfile
    from somar_tpu.solvers.multigrid import LevelMultigrid, MGParams

    make, nx, periodic, lo, hi = CASES[1]   # ledge: non-diagonal 2D
    grid, geo, bcs = make(nx, periodic, lo, hi)
    x = grid.cc_coord_1d(0)[None, :] * np.ones(grid.shape)
    z = grid.cc_coord_1d(1)[:, None] * np.ones(grid.shape)
    rhs = jnp.asarray(np.sin(2 * np.pi * x) * np.cos(np.pi * z), jnp.float32)
    dt_theta = jnp.float32(0.12)
    results = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("SOMAR_FUSED_GSRB", flag)
        mg = LevelMultigrid(geo, bcs, params=MGParams(eps=1e-6, imax=20))
        am = AlteredMetric(mg, LinearProfile(b0=0.0, slope=-25.0))
        deltas = am.jgup_delta_list(dt_theta)
        if flag == "1":
            assert mg.ops[0]._stencil_plan is not None
            assert mg.ops[0].delta_kernel_overrides(deltas[0]) is not None
        phi, (iters, relres) = mg.solve(rhs, jgup_deltas=deltas)
        results[flag] = (int(iters), float(relres), np.asarray(phi))
    assert results["1"][1] < 1e-5
    assert abs(results["1"][0] - results["0"][0]) <= 1
    scale = np.abs(results["0"][2]).max() + 1e-30
    np.testing.assert_allclose(results["1"][2] / scale,
                               results["0"][2] / scale, atol=1e-4)
