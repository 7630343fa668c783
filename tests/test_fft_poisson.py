"""Spectral direct solver tests: exactness for every BC combination."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from somar_tpu.core.grid import Grid
from somar_tpu.core.bc import BC, FieldBCs
from somar_tpu.geometry.geo_source import CartesianMap, TwistedMap
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.solvers.fft_poisson import FFTPoissonSolver
from somar_tpu.solvers.poisson_op import PoissonOp


def _bc(kind):
    return {"p": BC.periodic(), "n": BC.neumann(0.0),
            "d": BC.dirichlet(0.0)}[kind]


@pytest.mark.parametrize("kinds", ["pp", "nn", "dd", "pn", "np", "pd",
                                   "dn", "nd"])
def test_fft_solver_exact(kinds):
    n = 32
    periodic = tuple(k == "p" for k in kinds)
    g = Grid(nx=(n, n), dx=(1.0 / n, 0.5 / n), periodic=periodic)
    lg = build_level_geometry(g, CartesianMap())
    bcs = FieldBCs(lo=tuple(_bc(k) for k in kinds),
                   hi=tuple(_bc(k) for k in kinds))
    assert FFTPoissonSolver.supports(lg, bcs)
    sol = FFTPoissonSolver(lg, bcs)
    op = PoissonOp(lg, bcs)
    rng = np.random.default_rng(7)
    rhs = rng.normal(size=g.shape).astype(np.float32)
    rhs -= rhs.mean()
    phi = jax.jit(sol.solve)(jnp.asarray(rhs))
    res = np.array(op.residual(phi, jnp.asarray(rhs)))
    if "d" not in kinds:
        # singular problem: compatible part solved exactly
        res -= res.mean()
    scale = np.abs(rhs).max()
    assert np.abs(res).max() < 2e-4 * scale, np.abs(res).max()


def test_fft_helmholtz_exact():
    n = 32
    g = Grid(nx=(n, n), dx=(1.0 / n,) * 2, periodic=(True, False))
    lg = build_level_geometry(g, CartesianMap())
    bcs = FieldBCs(lo=(BC.periodic(), BC.dirichlet(0.0)),
                   hi=(BC.periodic(), BC.dirichlet(0.0)))
    sol = FFTPoissonSolver(lg, bcs)
    op = PoissonOp(lg, bcs)
    rng = np.random.default_rng(3)
    rhs = rng.normal(size=g.shape).astype(np.float32)
    phi = jax.jit(lambda r: sol.solve(r, alpha=1.0, beta=-0.05))(
        jnp.asarray(rhs))
    res = np.asarray(rhs) - np.asarray(op.apply(phi, 1.0, -0.05))
    assert np.abs(res).max() < 2e-5 * np.abs(rhs).max()


def test_fft_rejects_mapped_and_inhomogeneous():
    g = Grid(nx=(16, 16), dx=(1 / 16,) * 2, periodic=(True, True))
    lg_twisted = build_level_geometry(g, TwistedMap((0.05, 0.05), (1., 1.)))
    bcs = FieldBCs.uniform(BC.periodic(), 2)
    assert not FFTPoissonSolver.supports(lg_twisted, bcs)
    lg = build_level_geometry(g, CartesianMap())
    bad = FieldBCs.uniform(BC.dirichlet(1.0), 2)
    assert not FFTPoissonSolver.supports(lg, bad)
    ext = FieldBCs.uniform(BC.extrap(1), 2)
    assert not FFTPoissonSolver.supports(lg, ext)


def test_spectral_cf_ghost_zero_matches_mg():
    """AMR-patch operator: CF ghost-zero ends diagonalize in the DST-I
    family; the spectral solve must agree with multigrid."""
    import numpy as np
    from somar_tpu.core.bc import BC, BCType, FieldBCs
    from somar_tpu.core.grid import Grid
    from somar_tpu.geometry.geo_source import CartesianMap
    from somar_tpu.geometry.level_geometry import build_level_geometry
    from somar_tpu.solvers.fft_poisson import FFTPoissonSolver
    from somar_tpu.solvers.multigrid import LevelMultigrid, MGParams

    g = Grid(nx=(48, 16), dx=(1.0 / 48, 1.0 / 16), periodic=(False, False))
    lg = build_level_geometry(g, CartesianMap())
    # x: CF both sides (patch interior), z: Neumann walls
    bcs = FieldBCs(lo=(BC.cf(0.0), BC.neumann(0.0)),
                   hi=(BC.cf(0.0), BC.neumann(0.0)))
    assert FFTPoissonSolver.supports(lg, bcs)
    fft = FFTPoissonSolver(lg, bcs)
    assert not fft.singular
    from somar_tpu.solvers.poisson_op import PoissonOp
    op = PoissonOp(lg, bcs)

    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.normal(size=g.shape).astype(np.float32))
    p_fft = fft.solve(rhs)
    resid = op.apply(p_fft, 0.0, 1.0, homogeneous=True) - rhs
    rel = float(jnp.max(jnp.abs(resid))) / float(jnp.max(jnp.abs(rhs)))
    assert rel < 1e-4, rel
    # and it beats a few MG V-cycles on the same operator
    mg = LevelMultigrid(lg, bcs, params=MGParams(eps=1e-8, imax=60))
    p_mg, _ = mg.solve(rhs)
    resid_mg = op.apply(p_mg, 0.0, 1.0, homogeneous=True) - rhs
    assert float(jnp.max(jnp.abs(resid))) <=         float(jnp.max(jnp.abs(resid_mg))) + 1e-6


def test_spectral_mixed_end_axis():
    """Mixed Neumann-lo / Dirichlet-hi axis via the numeric eigenbasis."""
    import numpy as np
    from somar_tpu.core.bc import BC, FieldBCs
    from somar_tpu.core.grid import Grid
    from somar_tpu.geometry.geo_source import CartesianMap
    from somar_tpu.geometry.level_geometry import build_level_geometry
    from somar_tpu.solvers.fft_poisson import FFTPoissonSolver
    from somar_tpu.solvers.poisson_op import PoissonOp

    g = Grid(nx=(32, 16), dx=(1.0 / 32, 1.0 / 16), periodic=(False, False))
    lg = build_level_geometry(g, CartesianMap())
    bcs = FieldBCs(lo=(BC.neumann(0.0), BC.dirichlet(0.0)),
                   hi=(BC.dirichlet(0.0), BC.neumann(0.0)))
    assert FFTPoissonSolver.supports(lg, bcs)
    fft = FFTPoissonSolver(lg, bcs)
    op = PoissonOp(lg, bcs)

    rng = np.random.default_rng(1)
    rhs = jnp.asarray(rng.normal(size=g.shape).astype(np.float32))
    phi = fft.solve(rhs)
    resid = op.apply(phi, 0.0, 1.0, homogeneous=True) - rhs
    rel = float(jnp.max(jnp.abs(resid))) / float(jnp.max(jnp.abs(rhs)))
    assert rel < 1e-3, rel
