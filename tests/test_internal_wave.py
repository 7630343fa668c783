"""Internal-wave dispersion anchor: a single linear mode in a uniformly
stratified box must oscillate at omega = N kx / |k|.

This is the physics the framework exists for (stratified, nonhydrostatic:
the VERTICAL acceleration term is what produces the |k| in the dispersion
relation — a hydrostatic code gets omega = N kx/m instead).  Reference
physics: the BV/internal-wave machinery across AMRNavierStokes (e.g.
initializeInternalWaveSpeed, AMRNavierStokesInit.cpp:255) and the
InternalWave problem class.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from somar_tpu.core.grid import Grid
from somar_tpu.geometry.geo_source import CartesianMap
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.physics.navier_stokes import NSLevel, NSParams
from somar_tpu.solvers.multigrid import MGParams
from somar_tpu.problems.library import InternalWave
from somar_tpu.problems.base import LinearProfile


def test_internal_wave_dispersion_relation():
    # Lx = 2*pi (periodic), H = pi (rigid lids): mode (kx=1, m=1),
    # N = 1 -> omega = 1/sqrt(2), period T = 2*pi*sqrt(2) ~ 8.886
    Lx, H = 2.0 * np.pi, np.pi
    nx, nz = 48, 24
    g = Grid(nx=(nx, nz), dx=(Lx / nx, H / nz), x0=(0.0, 0.0),
             periodic=(True, False))
    geo = build_level_geometry(g, CartesianMap())
    prob = InternalWave(background=LinearProfile(b0=0.0, slope=-1.0))
    params = NSParams(nu=0.0, kappa=(0.0,), gravity_method=1,
                      mg=MGParams(eps=1e-7, imax=20))
    level = NSLevel(geo, prob, params)
    assert float(jnp.max(jnp.abs(level._nsq_cc - 1.0))) < 1e-6

    # overwrite the IC with one small-amplitude mode:
    # b' = A cos(kx x) sin(m z), u = w = 0
    state = level.initial_state()
    x = np.broadcast_to(geo.phys_coords_cc()[0], g.shape)
    z = np.broadcast_to(geo.phys_coords_cc()[1], g.shape)
    A = 1e-3
    b = A * np.cos(x) * np.sin(z)
    state = dataclasses.replace(
        state,
        vel=jnp.zeros_like(state.vel),
        scalars=state.scalars.at[0].set(jnp.asarray(b, jnp.float32)))
    state = level.post_initialize(state)

    dt = 0.05
    step = jax.jit(lambda s, d: level.advance(s, d))
    probe_idx = (nz // 3, nx // 8)
    ts, sig = [], []
    s = state
    nsteps = 280      # ~1.6 periods
    for i in range(nsteps):
        s = step(s, jnp.asarray(dt, jnp.float32))
        ts.append(float(s.time))
        sig.append(float(s.scalars[0][probe_idx]))
    sig = np.asarray(sig)
    ts = np.asarray(ts)
    assert np.all(np.isfinite(sig))

    # frequency from the least-squares best cosine over a scan
    # (robust against the slow amplitude decay of the limited advection)
    omegas = np.linspace(0.3, 1.2, 901)
    err = []
    for om in omegas:
        basis = np.stack([np.cos(om * ts), np.sin(om * ts)], axis=1)
        coef, res, *_ = np.linalg.lstsq(basis, sig, rcond=None)
        err.append(res[0] if res.size else np.sum(
            (sig - basis @ coef) ** 2))
    om_fit = omegas[int(np.argmin(err))]
    om_exact = 1.0 / np.sqrt(2.0)
    # 2nd-order space + projection splitting: a few percent at 48x24
    assert abs(om_fit - om_exact) < 0.05 * om_exact, (om_fit, om_exact)

    # the nonhydrostatic check: reject the hydrostatic dispersion
    # omega_hydro = N kx/m = 1 by a wide margin
    assert abs(om_fit - 1.0) > 0.2, om_fit


def test_solitary_wave_propagates_at_mode_speed():
    """Small-amplitude mode-1 packet from the SolitaryWave IC propagates
    rightward at the first-mode eigen speed c0 (reference: the
    SOLITARYWAVE_SET{SCALAR,VEL}IC pairing, SolitaryWaveBCUtilF.ChF —
    u = A dphi/dz with NO c0 factor; an extra c0 splits the packet into
    counter-propagating parts and the measured speed collapses to
    ~0.5 c0, the regression this test guards)."""
    from somar_tpu.problems.library import SolitaryWave

    Lx, H = 32.0, 1.0
    nx, nz = 256, 32
    g = Grid(nx=(nx, nz), dx=(Lx / nx, H / nz), x0=(-Lx / 2, -H),
             periodic=(False, False))
    geo = build_level_geometry(g, CartesianMap())
    prob = SolitaryWave(amplitude=0.002, width=3.0, x0=-8.0)
    c0 = prob._modes(geo)[0]
    assert 0.2 < c0 < 0.5, c0
    params = NSParams(nu=0.0, kappa=(0.0,), gravity_method=1,
                      mg=MGParams(eps=1e-6, imax=15))
    level = NSLevel(geo, prob, params)
    state = level.post_initialize(level.initial_state())
    step = jax.jit(lambda s, d: level.advance(s, d))
    x = np.asarray(g.cc_coord_1d(0))

    def centroid(s):
        col = np.abs(np.asarray(s.scalars[0])).sum(axis=0)
        w = col ** 2
        return float((x * w).sum() / w.sum())

    positions = [(0.0, centroid(state))]
    dt = jnp.asarray(0.05, jnp.float32)
    for i in range(240):
        state = step(state, dt)
        if (i + 1) % 48 == 0:
            positions.append((float(state.time), centroid(state)))
    ts = np.array([t for t, _ in positions])
    xs = np.array([p for _, p in positions])
    speed = np.polyfit(ts, xs, 1)[0]
    assert abs(speed / c0 - 1.0) < 0.1, (speed, c0)
    assert np.all(np.isfinite(np.asarray(state.scalars[0])))


def test_internal_wave_dispersion_3d_oblique():
    """3D quantitative anchor: an OBLIQUE mode (kx = ky = 1, m = 1)
    oscillates at omega = N k_h/|k| = sqrt(2/3) — exercises the full 3D
    stencils, the 3D projection, and the w N^2 coupling together
    (measured 0.810 vs 0.8165, 0.8%)."""
    Lx = Ly = 2.0 * np.pi
    H = np.pi
    nx, ny, nz = 24, 24, 16
    g = Grid(nx=(nx, ny, nz), dx=(Lx / nx, Ly / ny, H / nz),
             x0=(0.0, 0.0, 0.0), periodic=(True, True, False))
    geo = build_level_geometry(g, CartesianMap())
    prob = InternalWave(background=LinearProfile(b0=0.0, slope=-1.0))
    params = NSParams(nu=0.0, kappa=(0.0,), gravity_method=1,
                      mg=MGParams(eps=1e-7, imax=20))
    level = NSLevel(geo, prob, params)
    state = level.initial_state()
    xs = geo.phys_coords_cc()
    x = np.broadcast_to(xs[0], g.shape)
    y = np.broadcast_to(xs[1], g.shape)
    z = np.broadcast_to(xs[2], g.shape)
    b = 1e-3 * np.cos(x + y) * np.sin(z)
    state = dataclasses.replace(
        state, vel=jnp.zeros_like(state.vel),
        scalars=state.scalars.at[0].set(jnp.asarray(b, jnp.float32)))
    state = level.post_initialize(state)
    step = jax.jit(lambda s, d: level.advance(s, d))
    dt = jnp.asarray(0.05, jnp.float32)
    probe = (nz // 3, ny // 8, nx // 8)
    ts, sig = [], []
    for _ in range(200):
        state = step(state, dt)
        ts.append(float(state.time))
        sig.append(float(state.scalars[0][probe]))
    ts, sig = np.array(ts), np.array(sig)
    assert np.all(np.isfinite(sig))
    omegas = np.linspace(0.4, 1.2, 801)

    def lsq_err(om):
        basis = np.stack([np.cos(om * ts), np.sin(om * ts)], axis=1)
        coef = np.linalg.lstsq(basis, sig, rcond=None)[0]
        return float(np.sum((sig - basis @ coef) ** 2))

    om_fit = omegas[int(np.argmin([lsq_err(om) for om in omegas]))]
    om_exact = np.sqrt(2.0 / 3.0)
    assert abs(om_fit - om_exact) < 0.05 * om_exact, (om_fit, om_exact)
