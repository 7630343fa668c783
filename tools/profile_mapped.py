"""Phase-level profiling of the mapped (BeamGeneration) bench step.

Times the full step and its MG/advection phases on the terrain-following
non-diagonal metric at the bench resolution (640x512 by default).

Usage: python tools/profile_mapped.py
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
    from bench import _driver_from_config

    nx = int(os.environ.get("BENCH_BEAM_NX", 640))
    nz = int(os.environ.get("BENCH_BEAM_NZ", 512))
    drv = _driver_from_config(
        "/root/reference/exec/inputs.BeamGeneration.machine",
        [f"amr.nx={nx} {nz}", f"amr.nx_offset={-nx // 2} 0",
         "amr.maxlevel=0", "plot.plot_interval=-1",
         "plot.checkpoint_interval=-1", "amr.verbosity=0"], "beamprof")
    level = drv.level
    print(f"device: {jax.devices()[0].platform}  grid: {drv.grid.nx}  "
          f"diagonal metric: {level.geo.is_diagonal}")
    s0 = level.post_initialize(level.initial_state())
    dt = jnp.asarray(1.0, jnp.float32)
    step = drv._step_fn
    s1 = step(s0, dt)
    s2 = step(s1, dt)
    states = [(s1, dt), (s2, dt)]
    timeit(step, states, "full")

    def adv_vel(s, d):
        return level.compute_advecting_velocities(s, None, d)

    timeit(jax.jit(adv_vel), states, "adv_vel")

    def cc_proj(s, d):
        return level.projector.project_cc(s.vel, level.vel_bcs_trace,
                                          phi0=s.cc_phi)[0]

    timeit(jax.jit(cc_proj), states, "cc_proj")

    # one MG pressure solve on a fixed rhs
    from somar_tpu.ops.stencil import mac_divergence, cc_to_fc
    op = level.projector.op
    rhs1 = s1.vel[0] * 0.0 + jnp.sin(
        jnp.arange(drv.grid.shape[0] * drv.grid.shape[1], dtype=jnp.float32)
        .reshape(drv.grid.shape) * 0.01)
    rhs1 = op.compat_project(rhs1)
    rhs2 = rhs1 * 1.1
    mg = level.projector.mg

    def solve(r):
        return mg.solve(r)[0]

    timeit(jax.jit(solve), [(rhs1,), (rhs2,)], "mg_solve")

    def gsrb8(p, r):
        return op.relax(p, r, 0.0, 1.0, 8, "gsrb")

    z = jnp.zeros_like(rhs1)
    timeit(jax.jit(gsrb8), [(z, rhs1), (z, rhs2)], "gsrb8")

    def resid(p, r):
        return op.residual(p, r, 0.0, 1.0)

    timeit(jax.jit(resid), [(z, rhs1), (z, rhs2)], "residual")


if __name__ == "__main__":
    main()
