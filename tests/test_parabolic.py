"""Heat-solver tests: BE/CN/TGA decay rates on a periodic mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from somar_tpu.core.grid import Grid
from somar_tpu.core.bc import BC, FieldBCs
from somar_tpu.geometry.geo_source import CartesianMap
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.solvers.multigrid import MGParams
from somar_tpu.solvers.parabolic import make_heat_solver


@pytest.mark.parametrize("scheme,order", [(0, 1), (1, 2), (2, 2)])
def test_heat_decay_order(scheme, order):
    """A Fourier mode decays as exp(-kappa k^2 t); check the scheme's
    temporal order against the discrete-Laplacian-exact decay."""
    n = 32
    kappa = 0.1
    g = Grid(nx=(n, n), dx=(1.0 / n,) * 2, periodic=(True, True))
    lg = build_level_geometry(g, CartesianMap())
    bcs = FieldBCs.uniform(BC.periodic(), 2)
    solver = make_heat_solver(scheme, lg, bcs, kappa,
                              MGParams(eps=1e-8, imax=30))
    k = 2 * np.pi
    x, z = g.coords()
    s0 = jnp.asarray(np.sin(k * x) * np.ones(g.shape))
    # discrete eigenvalue of the 3-pt Laplacian for sin(kx)
    h = g.dx[0]
    lam = -(2.0 - 2.0 * np.cos(k * h)) / h**2

    T = 0.1

    def run(nsteps):
        dt = T / nsteps
        s = s0
        step = jax.jit(lambda s: solver.update(s, None, dt)[0])
        for _ in range(nsteps):
            s = step(s)
        return np.asarray(s)

    exact = np.asarray(s0) * np.exp(kappa * lam * T)
    e_coarse = np.max(np.abs(run(4) - exact))
    e_fine = np.max(np.abs(run(8) - exact))
    measured = np.log2(e_coarse / max(e_fine, 1e-12))
    assert measured > order - 0.45, (scheme, e_coarse, e_fine, measured)


def test_heat_dirichlet_stable():
    n = 16
    g = Grid(nx=(n, n), dx=(1.0 / n,) * 2)
    lg = build_level_geometry(g, CartesianMap())
    bcs = FieldBCs.uniform(BC.dirichlet(0.0), 2)
    solver = make_heat_solver(2, lg, bcs, 1.0, MGParams(eps=1e-7))
    s = jnp.ones(g.shape)
    step = jax.jit(lambda s: solver.update(s, None, 0.05)[0])
    for _ in range(5):
        s = step(s)
    arr = np.asarray(s)
    assert np.all(np.isfinite(arr))
    assert np.max(np.abs(arr)) < 1.0          # decaying toward 0
    assert np.max(np.abs(arr)) >= 0.0


def test_traced_dt_no_recompile():
    """dt is traced: two different dt values reuse one compiled step."""
    n = 16
    g = Grid(nx=(n, n), dx=(1.0 / n,) * 2, periodic=(True, True))
    lg = build_level_geometry(g, CartesianMap())
    bcs = FieldBCs.uniform(BC.periodic(), 2)
    solver = make_heat_solver(1, lg, bcs, 0.5)
    step = jax.jit(lambda s, dt: solver.update(s, None, dt)[0])
    s = jnp.ones(g.shape)
    out1 = step(s, jnp.asarray(0.01))
    out2 = step(s, jnp.asarray(0.02))
    assert step._cache_size() == 1
    assert np.all(np.isfinite(np.asarray(out1)))
    assert np.all(np.isfinite(np.asarray(out2)))
