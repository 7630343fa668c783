"""Fused Pallas GSRB / residual kernels vs the jnp PoissonOp reference.

The fused kernels (ops/gsrb_pallas.py) claim exact equivalence with
fill_ghosts_cc + mac_gradient + mac_divergence on the supported BC set
(uniform metric; PERIODIC / DIRICHLET / NEUMANN / CF / EXTRAP-0).  These
tests assert it to roundoff in interpret mode on CPU, for both the
whole-array ("small") and the z-slab variants, 2D and 3D, and check the
feature gate falls back where unsupported.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from somar_tpu.core.bc import BC, FieldBCs
from somar_tpu.core.grid import Grid
from somar_tpu.geometry.geo_source import CartesianMap
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.ops import gsrb_pallas as gp
from somar_tpu.solvers.poisson_op import PoissonOp


def _setup(nx, periodic, bcs_lo, bcs_hi):
    ndim = len(nx)
    grid = Grid(nx=nx, dx=tuple(0.3 + 0.2 * d for d in range(ndim)),
                periodic=periodic)
    geo = build_level_geometry(grid, CartesianMap())
    bcs = FieldBCs(lo=bcs_lo, hi=bcs_hi)
    op = PoissonOp(geo, bcs)
    rng = np.random.RandomState(7)
    phi = jnp.asarray(rng.randn(*grid.shape), jnp.float32)
    rhs = jnp.asarray(rng.randn(*grid.shape), jnp.float32)
    return grid, geo, bcs, op, phi, rhs


CASES = [
    # (nx, periodic, lo BCs, hi BCs)
    ((16, 12, 32), (False, True, False),
     (BC.neumann(), BC.periodic(), BC.neumann()),
     (BC.neumann(), BC.periodic(), BC.neumann())),
    ((16, 12, 32), (False, False, False),
     (BC.dirichlet(), BC.cf(), BC.neumann()),
     (BC.neumann(), BC.cf(), BC.extrap(0))),
    ((24, 32), (True, False),
     (BC.periodic(), BC.dirichlet()),
     (BC.periodic(), BC.neumann())),
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("mode", ["auto", "slab"])
def test_gsrb_matches_jnp(case, mode, monkeypatch):
    nx, periodic, lo, hi = case
    if mode == "slab":
        if len(nx) != 2:
            return  # slab variant is 3D-only; exercised via the 3D cases
        nx = (16, 12, 64)
        periodic = (False, True, False)
        lo = (BC.neumann(), BC.periodic(), BC.dirichlet())
        hi = (BC.dirichlet(), BC.periodic(), BC.neumann())
        monkeypatch.setattr(gp, "_VMEM_BUDGET", 500 * 1024)
    grid, geo, bcs, op, phi, rhs = _setup(nx, periodic, lo, hi)
    plan = gp.make_plan(grid, bcs, geo)
    assert plan is not None
    if mode == "slab":
        assert plan.mode == "slab"
    alpha, beta = 0.7, 1.3
    for iters in (1, 3):
        ref = op.relax_gsrb(phi, rhs, alpha, beta, iters)
        got = gp.gsrb_sweeps(plan, phi, rhs, alpha, beta, iters,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("case", CASES)
def test_residual_matches_jnp(case, monkeypatch):
    nx, periodic, lo, hi = case
    grid, geo, bcs, op, phi, rhs = _setup(nx, periodic, lo, hi)
    plan = gp.make_plan(grid, bcs, geo)
    assert plan is not None
    alpha, beta = 0.25, 0.9
    ref = op.residual(phi, rhs, alpha, beta, homogeneous=True)
    got = gp.helm_residual(plan, phi, rhs, alpha, beta, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_residual_slab_matches_jnp(monkeypatch):
    monkeypatch.setattr(gp, "_VMEM_BUDGET", 500 * 1024)
    nx, periodic = (16, 12, 64), (False, True, False)
    lo = (BC.neumann(), BC.periodic(), BC.dirichlet())
    hi = (BC.dirichlet(), BC.periodic(), BC.neumann())
    grid, geo, bcs, op, phi, rhs = _setup(nx, periodic, lo, hi)
    plan = gp.make_plan(grid, bcs, geo)
    assert plan is not None and plan.mode == "slab"
    ref = op.residual(phi, rhs, 0.0, 1.0, homogeneous=True)
    got = gp.helm_residual(plan, phi, rhs, 0.0, 1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_feature_gate():
    # extrap order >= 1 -> unsupported
    grid = Grid(nx=(8, 8), dx=(0.1, 0.1))
    bcs = FieldBCs.uniform(BC.extrap(1), 2)
    assert gp.make_plan(grid, bcs) is None
    # non-uniform metric -> unsupported
    from somar_tpu.geometry.geo_source import TwistedMap
    grid3 = Grid(nx=(8, 8, 8), dx=(0.1, 0.1, 0.1))
    geo = build_level_geometry(grid3, TwistedMap((0.1, 0.1, 0.1),
                                                 (1.0, 1.0, 1.0)))
    bcs3 = FieldBCs.uniform(BC.neumann(), 3)
    assert gp.make_plan(grid3, bcs3, geo) is None
    # supported set -> plan exists
    geo_c = build_level_geometry(grid3, CartesianMap())
    assert gp.make_plan(grid3, bcs3, geo_c) is not None
