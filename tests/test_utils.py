"""Utils tests: Shapiro filter, strat modes, debug, scheduler, derived."""

import numpy as np
import jax.numpy as jnp
import pytest

from somar_tpu.core.grid import Grid
from somar_tpu.core.bc import BC, FieldBCs
from somar_tpu.geometry.geo_source import CartesianMap
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.utils.filters import shapiro_filter, shapiro_filter_1d
from somar_tpu.utils.strat import (
    solve_vert_eigen_problem, compute_max_bv_freq, StructurePool)
from somar_tpu.utils.scheduler import Scheduler
from somar_tpu.utils.debug import bogus_like, assert_finite_host
from somar_tpu.problems.base import LinearProfile


def test_shapiro_kills_nyquist_keeps_mean():
    n = 32
    g = Grid(nx=(n, 4), dx=(1.0 / n, 0.25), periodic=(True, True))
    bcs = FieldBCs.uniform(BC.periodic(), 2)
    x = np.arange(n)
    nyq = ((-1.0) ** x)[None, :] * np.ones(g.shape)
    f = jnp.asarray(2.0 + nyq)
    out = np.asarray(shapiro_filter_1d(f, g, bcs, 0, strength=1.0))
    np.testing.assert_allclose(out, 2.0, atol=1e-6)   # Nyquist removed
    smooth = jnp.asarray(np.sin(2 * np.pi * x / n)[None, :] * np.ones(g.shape))
    out2 = np.asarray(shapiro_filter(smooth, g, bcs))
    # long wave barely damped
    assert np.max(np.abs(out2)) > 0.95 * np.max(np.abs(np.asarray(smooth)))


def test_vertical_modes_uniform_stratification():
    """With N^2 = const the modes are sin(j pi z / H): c_j = N H / (j pi)."""
    nz, H = 128, 1.0
    dz = H / nz
    nsq = np.full(nz, 4.0)   # N = 2
    c, phi = solve_vert_eigen_problem(nsq, dz, nmodes=2)
    np.testing.assert_allclose(c[0], 2.0 * H / np.pi, rtol=1e-3)
    np.testing.assert_allclose(c[1], 2.0 * H / (2 * np.pi), rtol=1e-3)
    z = (np.arange(nz) + 0.5) * dz
    target = np.sin(np.pi * z / H)
    assert np.max(np.abs(np.abs(phi[0]) - target)) < 1e-2
    assert compute_max_bv_freq(nsq) == 2.0


def test_structure_pool_caches():
    pool = StructurePool()
    bg = LinearProfile(slope=-4.0)
    a = pool.get(bg, 0.0, 32, 1.0 / 32)
    b = pool.get(bg, 0.0, 32, 1.0 / 32)
    assert a is b


def test_scheduler_fires_on_interval_and_period():
    sched = Scheduler()
    fired = []
    sched.schedule(lambda s, t, st: fired.append(("step", s)),
                   step_interval=2)
    sched.schedule(lambda s, t, st: fired.append(("time", round(t, 3))),
                   time_period=0.5)
    for step in range(1, 7):
        sched.execute(step, step * 0.2)
    steps = [f for f in fired if f[0] == "step"]
    times = [f for f in fired if f[0] == "time"]
    assert [s[1] for s in steps] == [2, 4, 6]
    assert len(times) >= 2


def test_debug_utils():
    x = jnp.ones((4, 4))
    b = bogus_like(x)
    assert float(b[0, 0]) > 1e29
    assert_finite_host(x, "x")
    with pytest.raises(FloatingPointError):
        assert_finite_host(jnp.asarray([np.nan]), "bad")


def test_derived_fields():
    import jax
    from somar_tpu.physics.navier_stokes import NSLevel, NSParams
    from somar_tpu.physics.derived import (
        compute_stream_function, compute_vorticity, kinetic_energy)
    from somar_tpu.problems.taylor_green import TaylorGreen
    from somar_tpu.solvers.multigrid import MGParams

    n = 32
    g = Grid(nx=(n, n), dx=(1.0 / n,) * 2, periodic=(True, True))
    lg = build_level_geometry(g, CartesianMap())
    prob = TaylorGreen()
    level = NSLevel(lg, prob, NSParams(gravity_method=0,
                                       mg=MGParams(eps=1e-6)))
    state = level.initial_state()
    w = compute_vorticity(level, state)
    # TG vorticity: 2k sin? magnitude ~ kx+ky scale
    assert float(jnp.max(jnp.abs(w))) > 1.0
    psi = compute_stream_function(level, state)
    # check lap(psi) = -w
    lap = level.projector.op.apply(psi, 0.0, 1.0)
    err = np.asarray(lap + w)
    assert np.max(np.abs(err - err.mean())) < 0.15 * float(jnp.max(jnp.abs(w)))
    ke = float(kinetic_energy(level, state))
    np.testing.assert_allclose(ke, 0.25, rtol=0.02)   # integral of TG KE


def test_compile_cache_dir_host_keyed_on_cpu(monkeypatch):
    """CPU-backend runs get a host-keyed cache dir (XLA:CPU loads AOT
    executables cached by a different machine despite mismatched CPU
    features — measured wrong gather results); accelerator runs share
    the plain dir."""
    from somar_tpu.utils.cache import compile_cache_dir, machine_tag

    tag = machine_tag()
    assert len(tag) == 8
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert compile_cache_dir("/x/.jax_cache") == f"/x/.jax_cache-cpu-{tag}"
    monkeypatch.setenv("JAX_PLATFORMS", "")
    assert compile_cache_dir("/x/.jax_cache") == "/x/.jax_cache"
