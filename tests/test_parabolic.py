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


@pytest.mark.parametrize("scheme", [0, 1, 2])
def test_spectral_fast_path_matches_mg(scheme):
    """The fused one-round-trip spectral update (solvers/parabolic.py)
    must match the explicit rhs-assembly + MG-solve path."""
    n = 16
    g = Grid(nx=(n, n), dx=(1.0 / n,) * 2, periodic=(True, False))
    lg = build_level_geometry(g, CartesianMap())
    bcs = FieldBCs(lo=(BC.periodic(), BC.neumann(0.0)),
                   hi=(BC.periodic(), BC.neumann(0.0)))
    fast = make_heat_solver(scheme, lg, bcs, 0.3,
                            MGParams(eps=1e-11, imax=60))
    slow = make_heat_solver(scheme, lg, bcs, 0.3,
                            MGParams(eps=1e-11, imax=60))
    assert fast._fft is not None
    slow._fft = None   # force the rhs-assembly + MG path
    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.standard_normal(g.shape), jnp.float32)
    src = jnp.asarray(rng.standard_normal(g.shape), jnp.float32)
    a, _ = fast.update(s, src, 0.05)
    b, _ = slow.update(s, src, 0.05)
    err = np.max(np.abs(np.asarray(a) - np.asarray(b)))
    assert err < 2e-4, (scheme, err)


@pytest.mark.parametrize("scheme", [0, 1, 2])
def test_batched_spectral_heat_matches_per_component(scheme):
    """BatchedSpectralHeat (stacked per-component eigenbases) must match
    the per-component spectral updates for components with different
    BCs (the NS viscous-solve configuration)."""
    from somar_tpu.solvers.parabolic import BatchedSpectralHeat
    n = 16
    g = Grid(nx=(n, n), dx=(1.0 / n,) * 2)
    lg = build_level_geometry(g, CartesianMap())
    bcs_u = FieldBCs(lo=(BC.dirichlet(0.0), BC.neumann(0.0)),
                     hi=(BC.dirichlet(0.0), BC.neumann(0.0)))
    bcs_w = FieldBCs(lo=(BC.neumann(0.0), BC.dirichlet(0.0)),
                     hi=(BC.neumann(0.0), BC.dirichlet(0.0)))
    solvers = [make_heat_solver(scheme, lg, b, 0.7)
               for b in (bcs_u, bcs_w)]
    assert BatchedSpectralHeat.supports(solvers)
    batched = BatchedSpectralHeat(solvers)
    rng = np.random.default_rng(7)
    fields = jnp.asarray(rng.standard_normal((2,) + g.shape), jnp.float32)
    srcs = jnp.asarray(rng.standard_normal((2,) + g.shape), jnp.float32)
    got = np.asarray(batched.update(fields, srcs, 0.04))
    for c in range(2):
        want, _ = solvers[c].update(fields[c], srcs[c], 0.04)
        err = np.max(np.abs(got[c] - np.asarray(want)))
        assert err < 1e-5, (scheme, c, err)
