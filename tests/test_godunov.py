"""Advection tests (reference analog: exec/inputs.AdvectionTest.machine —
pure advection, no projection, exercises the Godunov machinery alone)."""

import numpy as np
import jax
import jax.numpy as jnp

from somar_tpu.core.grid import Grid
from somar_tpu.core.bc import BC, FieldBCs
from somar_tpu.geometry.geo_source import CartesianMap
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.physics.godunov import (
    AdvectionParams, trace_face_states, flux_divergence)


def _advect(n, nsteps, cfl=0.8, order=2, ndim=2, limit=True, hol=False):
    g = Grid(nx=(n,) * ndim, dx=(1.0 / n,) * ndim, periodic=(True,) * ndim)
    lg = build_level_geometry(g, CartesianMap())
    bcs = FieldBCs.uniform(BC.periodic(), ndim)
    params = AdvectionParams(normal_pred_order=order, use_limiting=limit,
                             use_high_order_limiter=hol)

    vel = (1.0, 0.5) if ndim == 2 else (1.0, 0.5, 0.25)
    vel_cc = jnp.stack([v * jnp.ones(g.shape) for v in vel])
    adv_vel = tuple(v * jnp.ones(g.fc_shape(d)) for d, v in enumerate(vel))
    dt = cfl * g.dx[0] / max(vel)
    T = nsteps * dt

    coords = g.coords()

    def blob(shift):
        r2 = 0.0
        for d in range(ndim):
            xs = (np.asarray(coords[d]) - 0.5 - shift[d]) % 1.0
            xs = np.minimum(xs, 1.0 - xs)
            r2 = r2 + xs**2
        return np.exp(-60.0 * r2) * np.ones(g.shape)

    s = jnp.asarray(blob((0.0,) * ndim))

    @jax.jit
    def step(s):
        faces = trace_face_states(s, vel_cc, adv_vel, None, dt, lg, bcs, params)
        return s - dt * flux_divergence(faces, adv_vel, lg)

    for _ in range(nsteps):
        s = step(s)
    exact = blob(tuple(v * T for v in vel))
    return float(jnp.max(jnp.abs(s - exact))), s


def test_translation_2d_ppm_converges():
    e1, _ = _advect(32, 8)
    e2, _ = _advect(64, 16)
    order = np.log2(e1 / e2)
    assert order > 1.5, (e1, e2, order)
    assert e2 < 0.05, e2


def test_translation_2d_plm():
    e1, _ = _advect(32, 8, order=1)
    e2, _ = _advect(64, 16, order=1)
    assert np.log2(e1 / e2) > 1.2, (e1, e2)


def test_translation_3d_stable_at_high_cfl():
    # full CTU must be stable at CFL ~ 0.9 in 3D
    err, s = _advect(16, 12, cfl=0.9, ndim=3)
    assert np.all(np.isfinite(np.asarray(s)))
    assert float(jnp.max(jnp.abs(s))) < 1.5   # no blow-up, maxima bounded


def test_limiting_preserves_bounds():
    # step-function IC must stay within [0, 1] with limiting on
    n = 64
    g = Grid(nx=(n, n), dx=(1.0 / n,) * 2, periodic=(True, True))
    lg = build_level_geometry(g, CartesianMap())
    bcs = FieldBCs.uniform(BC.periodic(), 2)
    params = AdvectionParams(use_limiting=True)
    x, _ = g.coords()
    s = jnp.asarray((np.abs(np.asarray(x) - 0.5) < 0.2).astype(np.float32)
                    * np.ones(g.shape))
    vel_cc = jnp.stack([jnp.ones(g.shape), 0.3 * jnp.ones(g.shape)])
    adv_vel = (jnp.ones(g.fc_shape(0)), 0.3 * jnp.ones(g.fc_shape(1)))
    dt = 0.8 / n

    @jax.jit
    def step(s):
        faces = trace_face_states(s, vel_cc, adv_vel, None, dt, lg, bcs, params)
        return s - dt * flux_divergence(faces, adv_vel, lg)

    for _ in range(20):
        s = step(s)
    assert float(jnp.min(s)) > -0.02
    assert float(jnp.max(s)) < 1.02


def test_high_order_limiter_preserves_smooth_extrema():
    """advection.useHighOrderLimiter — the extremum-preserving cubic
    limiter (reference: MappedGodunovUtilities.H:155
    slopeLimiterExtPreserving / PPMLimiter's CheckCubicLimiterF branch,
    Colella & Sekora 2008).  The standard CW84 limiter flattens the
    parabola at every extremum, clipping a smooth Gaussian peak each
    step; the high-order limiter must (a) lose LESS amplitude and be at
    least as accurate, for both PPM and PLM, while (b) keeping a step
    profile bounded (it still clips discontinuities)."""
    for order in (2, 1):
        err_std, s_std = _advect(48, 12, order=order, hol=False)
        err_hol, s_hol = _advect(48, 12, order=order, hol=True)
        peak_std = float(jnp.max(s_std))
        peak_hol = float(jnp.max(s_hol))
        # the peak must survive better AND overall accuracy not degrade
        assert peak_hol > peak_std + 1e-4, (order, peak_std, peak_hol)
        assert err_hol <= err_std * 1.05, (order, err_std, err_hol)

    # discontinuity: bounds still hold with the high-order limiter
    n = 64
    g = Grid(nx=(n, n), dx=(1.0 / n,) * 2, periodic=(True, True))
    lg = build_level_geometry(g, CartesianMap())
    bcs = FieldBCs.uniform(BC.periodic(), 2)
    params = AdvectionParams(use_limiting=True, use_high_order_limiter=True)
    x, _ = g.coords()
    s = jnp.asarray((np.abs(np.asarray(x) - 0.5) < 0.2).astype(np.float32)
                    * np.ones(g.shape))
    vel_cc = jnp.stack([jnp.ones(g.shape), 0.3 * jnp.ones(g.shape)])
    adv_vel = (jnp.ones(g.fc_shape(0)), 0.3 * jnp.ones(g.fc_shape(1)))
    dt = 0.8 / n

    @jax.jit
    def step(s):
        faces = trace_face_states(s, vel_cc, adv_vel, None, dt, lg, bcs,
                                  params)
        return s - dt * flux_divergence(faces, adv_vel, lg)

    for _ in range(20):
        s = step(s)
    assert float(jnp.min(s)) > -0.03
    assert float(jnp.max(s)) < 1.03


def test_uniform_field_is_preserved():
    # constancy: uniform scalar + divergence-free velocity -> no change
    n = 32
    g = Grid(nx=(n, n), dx=(1.0 / n,) * 2, periodic=(True, True))
    lg = build_level_geometry(g, CartesianMap())
    bcs = FieldBCs.uniform(BC.periodic(), 2)
    params = AdvectionParams()
    k = 2 * np.pi
    xf = g.fc_coord_1d(0).reshape(1, -1)
    zf = g.fc_coord_1d(1).reshape(-1, 1)
    xc, zc = g.coords()
    # discretely divergence-free MAC velocity from nodal streamfunction
    psi = np.sin(k * np.arange(n + 1) / n)[None, :] * \
        np.sin(k * np.arange(n + 1) / n)[:, None]
    u = jnp.asarray(np.diff(psi, axis=0) / g.dx[1])     # (n, n+1)
    w = jnp.asarray(-np.diff(psi, axis=1) / g.dx[0])    # (n+1, n)
    adv_vel = (u, w)
    vel_cc = jnp.stack([
        0.5 * (u[:, 1:] + u[:, :-1]),
        0.5 * (w[1:, :] + w[:-1, :])])
    s = jnp.ones(g.shape)
    dt = 0.5 / n
    faces = trace_face_states(s, vel_cc, adv_vel, None, dt, lg, bcs, params)
    upd = flux_divergence(faces, adv_vel, lg)
    assert float(jnp.max(jnp.abs(upd))) < 1e-4
