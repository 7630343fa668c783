"""Production-scale physics anchors beyond the 512 lock exchange.

Two quantitative checks against linear/weakly-nonlinear theory, run on
the real chip at production-class resolution (the lock exchange already
has docs/PARITY_512.json; these match that standard for the other two
flagship configurations):

  * BeamGeneration — the shipped terrain-following config
    (exec/inputs.BeamGeneration.machine) at the 640x512 bench
    resolution.  Internal-tide beams radiate from the critical ridge at
    the angle linear theory dictates: sin(theta) = omega/N with
    N^2 = 1.493e-5 (hardcoded in the reference's
    BeamGenerationBCUtil.cpp:45) and omega = 1e-3, i.e. theta = 15.0
    degrees — by construction equal to the ridge slope
    (geometry.alpha = 15, critical generation).  After a tidal period
    of spin-up we time-average the perturbation kinetic energy over a
    second period and estimate the beam angle as the KE-weighted mean
    ray angle from the ridge crest inside an annulus above the ridge.
    Recorded: beam angle (deg) vs 15.0, beam velocity amplitude
    relative to the tidal amplitude U0.

  * DJL solitary wave — a mode-1 internal solitary wave (DJL problem
    class, weakly-nonlinear eta) propagating ~20 widths across a
    2048x128 grid.  A DJL/KdV wave is a traveling-wave solution: shape
    and amplitude must persist.  Recorded: measured speed vs the
    mode-1 eigen speed c0, amplitude retention, and the peak normalized
    cross-correlation of the final column-integrated |b'| envelope
    against the initial one (shape preservation; shift-invariant).

Writes docs/ANCHORS_PROD.json.

Usage:  python tools/anchors_production.py              (TPU)
        ANCHOR_FAST=1 python tools/anchors_production.py (CPU smoke)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

FAST = bool(int(os.environ.get("ANCHOR_FAST", "0")))


def beam_anchor():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from somar_tpu.config.context import ProblemContext
    from somar_tpu.driver import RunDriver
    import tempfile

    nx = 160 if FAST else int(os.environ.get("BEAM_NX", 640))
    nz = 128 if FAST else int(os.environ.get("BEAM_NZ", 512))
    ctx = ProblemContext.from_file(
        "/root/reference/exec/inputs.BeamGeneration.machine",
        [f"amr.nx={nx} {nz}", f"amr.nx_offset={-nx // 2} 0",
         "amr.maxlevel=0", "plot.plot_interval=-1",
         "plot.checkpoint_interval=-1", "amr.verbosity=0"])
    drv = RunDriver(ctx, out_dir=tempfile.mkdtemp(prefix="anchor_beam_"))
    level, grid = drv.level, drv.grid
    geo = level.geo

    omega = ctx.tidal_omega                      # 1e-3
    N = float(np.sqrt(1.493e-5))                 # BeamGenerationBCUtil.cpp:45
    theta_lin = float(np.degrees(np.arcsin(omega / N)))   # = 15.00 deg
    period = 2.0 * np.pi / omega                 # ~6283 s

    state = level.post_initialize(level.initial_state())
    dtv = float(drv._dt_fn(state)) * 0.9
    step = drv._step_fn
    dt = jnp.asarray(dtv, jnp.float32)
    n_spin = int((0.25 if FAST else 1.0) * period / dtv)
    n_avg = int((0.25 if FAST else 1.0) * period / dtv)
    print(f"# beam: grid={grid.nx} dt={dtv:.1f}s spinup={n_spin} "
          f"avg={n_avg} steps", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(n_spin):
        state = step(state, dt)
    # time-average perturbation KE over the sampling period (sample
    # every few steps; the barotropic tide is removed per-z-row)
    coords = geo.phys_coords_cc()
    xs = np.broadcast_to(np.asarray(coords[0]), grid.shape)
    zs = np.broadcast_to(np.asarray(coords[grid.ndim - 1]), grid.shape)
    ke_sum = np.zeros(grid.shape, np.float64)
    nsamp = 0
    every = max(1, n_avg // 32)
    for i in range(n_avg):
        state = step(state, dt)
        if (i + 1) % every == 0:
            u = np.asarray(state.vel[0], np.float64)
            w = np.asarray(state.vel[grid.ndim - 1], np.float64)
            up = u - u.mean(axis=grid.axis(0), keepdims=True)
            ke_sum += up * up + w * w
            nsamp += 1
    jax.block_until_ready(state.vel)
    wall = time.perf_counter() - t0
    ke = ke_sum / max(nsamp, 1)

    # ray-angle estimate from the ridge crest inside an annulus
    src = geo.geo  # BathymetricMap
    crest = (0.0, float(src.peak)) if hasattr(src, "peak") else (0.0, 0.0)
    rx = xs - crest[0]
    rz = zs - crest[1]
    r = np.hypot(rx, rz)
    ang = np.degrees(np.arctan2(rz, np.abs(rx)))   # from horizontal
    r_lo, r_hi = 500.0, 2500.0
    sel = (r > r_lo) & (r < r_hi) & (ang > 4.0) & (ang < 50.0)
    wgt = np.where(sel, ke, 0.0)
    theta_meas = float((ang * wgt).sum() / max(wgt.sum(), 1e-30))
    # beam velocity amplitude relative to the barotropic forcing
    amp = float(np.sqrt(ke[sel].max())) if sel.any() else 0.0
    rel_amp = amp / ctx.tidal_u0[0]
    out = {
        "grid": list(grid.nx), "dt_s": dtv,
        "spinup_steps": n_spin, "avg_steps": n_avg,
        "theta_linear_deg": theta_lin,
        "theta_measured_deg": theta_meas,
        "theta_err_deg": abs(theta_meas - theta_lin),
        "beam_amp_over_U0": rel_amp,
        "wall_s": round(wall, 1),
    }
    print(f"# beam: theta={theta_meas:.2f} deg (linear {theta_lin:.2f}), "
          f"amp/U0={rel_amp:.2f}", file=sys.stderr)
    return out


def djl_anchor():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from somar_tpu.core.grid import Grid
    from somar_tpu.geometry.geo_source import CartesianMap
    from somar_tpu.geometry.level_geometry import build_level_geometry
    from somar_tpu.physics.navier_stokes import NSLevel, NSParams
    from somar_tpu.solvers.multigrid import MGParams
    from somar_tpu.problems.library import DJL

    Lx, H = 64.0, 1.0
    nx, nz = (256, 32) if FAST else (2048, 128)
    horizon = 8.0 if FAST else 120.0
    g = Grid(nx=(nx, nz), dx=(Lx / nx, H / nz), x0=(-Lx / 2, -H),
             periodic=(False, False))
    geo = build_level_geometry(g, CartesianMap())
    prob = DJL(amplitude=0.05, width=2.0, x0=-Lx / 4)
    c0 = prob._kdv._modes(geo)[0]
    params = NSParams(nu=0.0, kappa=(0.0,), gravity_method=1,
                      mg=MGParams(eps=1e-6, imax=15))
    level = NSLevel(geo, prob, params)
    state = level.post_initialize(level.initial_state())
    step = jax.jit(lambda s, d: level.advance(s, d))
    # compute_dt sees only the (initially small) velocities; the wave
    # itself moves at c0, so cap dt at the wave-advective CFL too
    dtv = min(0.9 * float(jax.jit(level.compute_dt)(state)),
              0.5 * g.dx[0] / c0)
    nsteps = int(horizon / dtv)
    print(f"# djl: grid={g.nx} c0={c0:.3f} dt={dtv:.3f} steps={nsteps}",
          file=sys.stderr)
    x = np.asarray(g.cc_coord_1d(0))

    def envelope(s):
        return np.abs(np.asarray(s.scalars[0], np.float64)).sum(axis=0)

    def centroid(env):
        w = env ** 2
        return float((x * w).sum() / w.sum())

    env0 = envelope(state)
    x0 = centroid(env0)
    a0 = float(np.abs(np.asarray(state.scalars[0])).max())
    dt = jnp.asarray(dtv, jnp.float32)
    t0 = time.perf_counter()
    for _ in range(nsteps):
        state = step(state, dt)
    jax.block_until_ready(state.scalars)
    wall = time.perf_counter() - t0
    env1 = envelope(state)
    x1 = centroid(env1)
    a1 = float(np.abs(np.asarray(state.scalars[0])).max())
    T = nsteps * dtv
    speed = (x1 - x0) / T

    # shape preservation: peak normalized cross-correlation of the
    # final envelope against the initial one over all shifts
    e0 = env0 - env0.mean()
    e1 = env1 - env1.mean()
    corr = np.correlate(e1, e0, mode="full")
    corr /= max(np.sqrt((e0 * e0).sum() * (e1 * e1).sum()), 1e-30)
    shape_corr = float(corr.max())

    out = {
        "grid": [nx, nz], "c0": float(c0), "dt": dtv, "steps": nsteps,
        "distance_widths": (x1 - x0) / prob._kdv.width,
        "speed_over_c0": speed / c0,
        "amp_retention": a1 / a0,
        "shape_corr": shape_corr,
        "wall_s": round(wall, 1),
    }
    print(f"# djl: speed/c0={speed / c0:.3f} amp={a1 / a0:.3f} "
          f"corr={shape_corr:.4f} ({out['distance_widths']:.1f} widths)",
          file=sys.stderr)
    return out


def main():
    import jax
    from somar_tpu.utils.cache import compile_cache_dir
    cache = compile_cache_dir(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    which = os.environ.get("ANCHOR_ONLY", "beam,djl").split(",")
    res = {"device": jax.devices()[0].platform}
    if "djl" in which:
        res["djl"] = djl_anchor()
    if "beam" in which:
        res["beam"] = beam_anchor()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "docs", "ANCHORS_PROD.json")
    if FAST:
        print(json.dumps(res, indent=1))
    else:
        with open(path, "w") as f:
            json.dump(res, f, indent=1)
        print(f"# wrote {path}", file=sys.stderr)
        print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
