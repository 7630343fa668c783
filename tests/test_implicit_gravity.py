"""Semi-implicit gravity (PPMIG / BV scheme) tests.

Reference: AMRNavierStokesAdvancePPMIG.cpp + AlteredMetric.  Validation
strategy per SURVEY.md section 7.6: IG must agree with the explicit-gravity
scheme at small dt, and must remain stable at dt >> 1/N where the
explicit scheme's buoyancy oscillations would demand tiny steps.
"""

import numpy as np
import jax
import jax.numpy as jnp

from somar_tpu.core.grid import Grid
from somar_tpu.core.bc import BC, FieldBCs
from somar_tpu.geometry.geo_source import CartesianMap
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.physics.navier_stokes import NSLevel, NSParams
from somar_tpu.solvers.multigrid import MGParams
from somar_tpu.problems.base import LinearProfile, Problem


class StratifiedPatch(Problem):
    """Linear stratification with a small Gaussian buoyancy anomaly —
    radiates internal waves at frequency <= N."""

    name = "StratifiedPatch"
    use_background_scalar = True

    def __init__(self, nsq=25.0):
        # N^2 = -slope -> slope = -nsq
        self.background = LinearProfile(b0=0.0, slope=-nsq)

    def scalar_ic(self, geo, comp=0):
        import numpy as np
        grid = geo.grid
        xs = geo.phys_coords_cc()
        x = np.broadcast_to(xs[0], grid.shape) - 0.5
        z = np.broadcast_to(xs[-1], grid.shape) + 0.5
        return jnp.asarray(0.01 * np.exp(-((x / 0.1) ** 2 + (z / 0.1) ** 2)))


def _make_level(gravity_method, n=32, nsq=25.0):
    g = Grid(nx=(n, n), dx=(1.0 / n,) * 2, x0=(0.0, -1.0),
             periodic=(True, False))
    lg = build_level_geometry(g, CartesianMap())
    prob = StratifiedPatch(nsq=nsq)
    params = NSParams(nu=0.0, kappa=(0.0,), gravity_method=gravity_method,
                      gravity_theta=0.6, mg=MGParams(eps=1e-6, imax=20))
    return NSLevel(lg, prob, params)


def test_ig_matches_explicit_at_small_dt():
    nsq = 25.0   # N = 5, period ~ 1.26
    lev_ex = _make_level(1, nsq=nsq)
    lev_ig = _make_level(2, nsq=nsq)
    assert lev_ig._altered_metric is not None

    dt = jnp.asarray(0.002)   # dt*N = 0.01 << 1
    s_ex = lev_ex.post_initialize(lev_ex.initial_state())
    s_ig = lev_ig.post_initialize(lev_ig.initial_state())
    step_ex = jax.jit(lambda s: lev_ex.advance(s, dt))
    step_ig = jax.jit(lambda s: lev_ig.advance(s, dt))
    for _ in range(10):
        s_ex = step_ex(s_ex)
        s_ig = step_ig(s_ig)
    db = float(jnp.max(jnp.abs(s_ex.scalars - s_ig.scalars)))
    dv = float(jnp.max(jnp.abs(s_ex.vel - s_ig.vel)))
    bscale = float(jnp.max(jnp.abs(s_ex.scalars))) + 1e-12
    vscale = float(jnp.max(jnp.abs(s_ex.vel))) + 1e-12
    assert db / bscale < 0.08, (db, bscale)
    assert dv / vscale < 0.15, (dv, vscale)


def test_ig_stable_at_large_dt_n():
    # dt*N = 2.5: explicit buoyancy coupling would be unstable/oscillatory;
    # the theta-weighted implicit scheme must stay bounded.
    nsq = 2500.0  # N = 50
    lev_ig = _make_level(2, nsq=nsq)
    dt = jnp.asarray(0.05)    # dt*N = 2.5
    s = lev_ig.post_initialize(lev_ig.initial_state())
    step = jax.jit(lambda st: lev_ig.advance(st, dt))
    b0 = float(jnp.max(jnp.abs(s.scalars)))
    for _ in range(20):
        s = step(s)
    assert np.all(np.isfinite(np.asarray(s.vel)))
    assert np.all(np.isfinite(np.asarray(s.scalars)))
    bN = float(jnp.max(jnp.abs(s.scalars)))
    assert bN < 20.0 * b0 + 1e-6, (b0, bN)


def test_explicit_unstable_where_ig_stable():
    # same configuration, explicit gravity: the buoyancy oscillation at
    # dt*N = 2.5 amplifies (documents WHY the IG scheme exists)
    nsq = 2500.0
    lev_ex = _make_level(1, nsq=nsq)
    dt = jnp.asarray(0.05)
    s = lev_ex.post_initialize(lev_ex.initial_state())
    step = jax.jit(lambda st: lev_ex.advance(st, dt))
    b0 = float(jnp.max(jnp.abs(s.scalars)))
    for _ in range(20):
        s = step(s)
    bN = float(jnp.max(jnp.abs(np.nan_to_num(np.asarray(s.scalars),
                                             nan=1e30, posinf=1e30,
                                             neginf=-1e30))))
    assert bN > 20.0 * b0 or not np.all(np.isfinite(np.asarray(s.scalars)))


def _make_mapped_level(gravity_method, nsq=25.0):
    """StratifiedPatch over the shelf-break LedgeMap: the IG altered
    metric must modify the FULL (non-diagonal) Jgup."""
    from somar_tpu.geometry.bathymetric import LedgeMap
    g = Grid(nx=(32, 16), dx=(2.0 / 32, 1.0 / 16), x0=(-1.0, -1.0),
             periodic=(False, False))
    lg = build_level_geometry(g, LedgeMap((-1.0, 0.0), hl=0.6, hr=1.0,
                                          xl=-0.5, xr=0.5))
    prob = StratifiedPatch(nsq=nsq)
    params = NSParams(nu=0.0, kappa=(0.0,), gravity_method=gravity_method,
                      gravity_theta=0.6,
                      mg=MGParams(eps=1e-6, imax=25, relax_mode="line"))
    return NSLevel(lg, prob, params)


def test_ig_matches_explicit_on_mapped_metric():
    """IG vs explicit agreement at small dt*N on a terrain-following
    metric (the altered-metric jgup_delta path with non-diagonal Jgup;
    reference: doCCIGProjection redefines the projector with
    AlteredMetric on the mapped operator,
    AMRNavierStokesAdvancePPMIG.cpp:323-331).  All other IG tests are
    Cartesian."""
    nsq = 25.0
    lev_ex = _make_mapped_level(1, nsq=nsq)
    lev_ig = _make_mapped_level(2, nsq=nsq)
    assert lev_ig._altered_metric is not None
    assert not lev_ig.geo.is_uniform

    dt = jnp.asarray(0.002)   # dt*N = 0.01 << 1
    s_ex = lev_ex.post_initialize(lev_ex.initial_state())
    s_ig = lev_ig.post_initialize(lev_ig.initial_state())
    step_ex = jax.jit(lambda s: lev_ex.advance(s, dt))
    step_ig = jax.jit(lambda s: lev_ig.advance(s, dt))
    for _ in range(10):
        s_ex = step_ex(s_ex)
        s_ig = step_ig(s_ig)
    db = float(jnp.max(jnp.abs(s_ex.scalars - s_ig.scalars)))
    dv = float(jnp.max(jnp.abs(s_ex.vel - s_ig.vel)))
    bscale = float(jnp.max(jnp.abs(s_ex.scalars))) + 1e-12
    vscale = float(jnp.max(jnp.abs(s_ex.vel))) + 1e-12
    assert np.isfinite(db) and np.isfinite(dv)
    assert db / bscale < 0.08, (db, bscale)
    assert dv / vscale < 0.15, (dv, vscale)


def test_ig_stable_at_large_dt_n_on_mapped_metric():
    lev = _make_mapped_level(2, nsq=2500.0)   # N = 50
    dt = jnp.asarray(0.05)                    # dt*N = 2.5
    s = lev.post_initialize(lev.initial_state())
    step = jax.jit(lambda st: lev.advance(st, dt))
    for _ in range(20):
        s = step(s)
    b = np.asarray(s.scalars[0])
    assert np.isfinite(b).all()
    assert np.abs(b).max() < 0.05   # bounded (IC anomaly is 0.01)


def test_ig_time_convergence():
    """IG dt-refinement: errors vs a small-dt reference shrink at least
    linearly per dt halving (theta = 0.6 is formally 1st order; measured
    ratios ~2.4-3.1 per halving)."""
    lev = _make_level(2, nsq=25.0)
    s0 = lev.post_initialize(lev.initial_state())
    T = 0.08

    def run(nsteps):
        dt = jnp.asarray(T / nsteps)
        step = jax.jit(lambda s: lev.advance(s, dt))
        s = s0
        for _ in range(nsteps):
            s = step(s)
        return s

    ref = run(64)
    errs = []
    for n in (8, 16, 32):
        s = run(n)
        errs.append(float(jnp.max(jnp.abs(s.scalars - ref.scalars))))
    assert errs[0] / errs[1] > 1.8, errs
    assert errs[1] / errs[2] > 1.8, errs
