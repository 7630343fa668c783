"""Phase-level TPU profiling of the 512-class NS step (perf playbook).

Times each phase of the full step in isolation at the bench resolution —
the measurement harness for the optimization loop (see
docs/STATUS.md's perf findings log for the ground rules: only trust
deltas > ~3 ms through the axon relay, vary inputs between timing
calls, ablate the FULL step not microbenches).

Usage:  python tools/bench_profile.py            # 512x128x128
        BENCH_NX=256 python tools/bench_profile.py

Phases reported (ms/step):
  full         the whole advance (the bench number)
  adv_vel      compute_advecting_velocities (trace + MAC projection)
  scal_lam     get_new_scalars_and_lambda (traces + diffusion solves)
  velocity     get_new_velocity (momentum traces + viscous solves)
  cc_proj      the CC projection
  fft_solve    one spectral pressure solve
  mg_solve     one MG pressure solve (same rhs; the GSRB target)
  gsrb8        8 GSRB sweeps on the finest op (smoother speed-of-light)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def timeit(fn, args_seq, label, reps=5):
    import jax
    out = fn(*args_seq[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*args_seq[i % len(args_seq)])
    jax.block_until_ready(out)
    ms = 1e3 * (time.perf_counter() - t0) / reps
    print(f"{label:12s} {ms:8.2f} ms")
    return ms


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_level

    nx = int(os.environ.get("BENCH_NX", 512))
    ny = int(os.environ.get("BENCH_NY", 128))
    nz = int(os.environ.get("BENCH_NZ", 128))
    print(f"device: {jax.devices()[0].platform}  grid: {nx}x{ny}x{nz}")
    level, grid = _build_level(nx=nx, nz=nz, ny=ny, mg_eps=1e-5)
    s0 = level.initial_state()
    dt = jnp.asarray(0.01, jnp.float32)
    step = jax.jit(lambda s, d: level.advance(s, d))
    s1 = step(s0, dt)
    s2 = step(s1, dt)   # two states so timing inputs vary (relay cache)
    jax.block_until_ready(s2)
    states = [(s1, dt), (s2, dt)]

    timeit(step, states, "full")

    # phase ablations (each jitted standalone; shared ghost fills inside)
    def adv_vel(s, d):
        import somar_tpu.physics.navier_stokes as nsmod
        grav = level._gravity_source(s.scalars)
        src = tuple(grav[m] for m in range(grid.ndim))
        from somar_tpu.core.bc import fill_ghosts_cc
        from somar_tpu.physics.godunov import ADVECT_GROW
        u_mapped = level.geo.to_mapped(s.vel)
        level._u_pad = [fill_ghosts_cc(u_mapped[dd], level.grid,
                                       level.vel_bcs_trace[dd], ADVECT_GROW)
                        for dd in range(grid.ndim)]
        out = level.compute_advecting_velocities(s, src, d)
        level._u_pad = None
        return out

    timeit(jax.jit(adv_vel), states, "adv_vel")

    def cc_proj(s, d):
        return level.projector.project_cc(s.vel, level.vel_bcs_trace,
                                          phi0=s.cc_phi)[0]

    timeit(jax.jit(cc_proj), states, "cc_proj")

    rhs1 = level.cell_divergence(s1)
    rhs2 = level.cell_divergence(s2)
    jax.block_until_ready((rhs1, rhs2))
    if level.projector.fft is not None:
        timeit(jax.jit(lambda r: level.projector.fft.solve(r)),
               [(rhs1,), (rhs2,)], "fft_solve")
    mg = level.projector.mg
    timeit(jax.jit(lambda r: mg.solve(r, singular=True)[0]),
           [(rhs1,), (rhs2,)], "mg_solve")
    _, (its, rel) = jax.jit(lambda r: mg.solve(r, singular=True))(rhs1)
    print(f"(mg_solve: {int(its)} V-cycles to rel={float(rel):.2e})")
    timeit(jax.jit(lambda r: mg._vcycle(0, jnp.zeros_like(r), r, 0.0, 1.0,
                                        True)),
           [(rhs1,), (rhs2,)], "mg_vcycle1")
    op = mg.ops[0]
    timeit(jax.jit(lambda r: op.relax(jnp.zeros_like(r), r, 0.0, 1.0, 8,
                                      "gsrb")),
           [(rhs1,), (rhs2,)], "gsrb8")
    # HBM speed-of-light estimate for one GSRB sweep: ~3 arrays moved
    nbytes = 4 * rhs1.size
    print(f"(one gsrb sweep moves >= ~{3 * nbytes / 1e6:.0f} MB; "
          f"v5e HBM ~ 800 GB/s => floor ~ {3 * nbytes / 800e9 * 1e3:.2f} "
          f"ms/sweep)")


if __name__ == "__main__":
    main()
