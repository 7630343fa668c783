"""Phase-level profiling of the mapped (BeamGeneration) bench step.

Times the full step and its MG/advection phases on the terrain-following
non-diagonal metric at the bench resolution (640x512 by default), with
the honest timing discipline from tools/timing.py (chained in-jit loops,
varied traced scalar, host-readback barrier).

Usage: python tools/profile_mapped.py
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing import per_iter  # noqa: E402


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
    s1 = drv._step_fn(s0, dt)

    per_iter(lambda s: level.advance(s, dt), s1, "full step", n_lo=1,
             n_hi=5)

    def folded(phase_out, s):
        leaf = jax.tree_util.tree_leaves(phase_out)[0]
        return dataclasses.replace(
            s, vel=s.vel * (1.0 + 1e-20 * jnp.sum(leaf)))

    per_iter(lambda s: folded(
        level.compute_advecting_velocities(s, None, dt), s), s1,
        "adv_vel (trace + MAC proj)", n_lo=1, n_hi=5)

    per_iter(lambda s: folded(level.projector.project_cc(
        s.vel, level.vel_bcs_trace, phi0=s.cc_phi)[0], s), s1,
        "cc_proj", n_lo=1, n_hi=5)

    def scal_lam(s):
        from somar_tpu.core.bc import fill_ghosts_cc
        from somar_tpu.physics.godunov import ADVECT_GROW, pad_valid_faces
        u_mapped = level.geo.to_mapped(s.vel)
        level._u_pad = [fill_ghosts_cc(u_mapped[d], drv.grid,
                                       level.vel_bcs_trace[d],
                                       ADVECT_GROW)
                        for d in range(drv.grid.ndim)]
        adv_vel, _ = level.compute_advecting_velocities(s, None, dt)
        level._adv_valid = adv_vel
        level._adv_pad = tuple(pad_valid_faces(adv_vel[d], drv.grid, d)
                               for d in range(drv.grid.ndim))
        out = level.get_new_scalars_and_lambda(s, dt)
        level._u_pad = None
        level._adv_pad = None
        level._adv_valid = None
        return folded((adv_vel, out), s)

    per_iter(scal_lam, s1, "adv_vel + scalars+lambda", n_lo=1, n_hi=5)

    rhs = jax.jit(level.cell_divergence)(s1)
    op = level.projector.op
    mg = level.projector.mg
    _, (its, rel) = jax.jit(lambda r: mg.solve(r))(rhs)
    print(f"(mg_solve: {int(its)} V-cycles to rel={float(rel):.2e}; "
          f"modes {mg.modes[:4]})")
    per_iter(lambda r: mg.solve(r)[0], rhs, "mg_solve (cold)", n_lo=1,
             n_hi=4)
    per_iter(lambda r: op.relax(jnp.zeros_like(r), r, 0.0, 1.0, 8,
                                mg.modes[0]), rhs, "relax x8")
    per_iter(lambda r: r - op.residual(jnp.zeros_like(r), r, 0.0, 1.0),
             rhs, "residual")


if __name__ == "__main__":
    main()
