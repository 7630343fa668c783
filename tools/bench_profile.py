"""Phase-level TPU profiling of the 512-class NS step (perf playbook).

Times each phase of the full step in isolation at the bench resolution —
the measurement harness for the optimization loop.  Uses the honest
timing discipline from tools/timing.py: chained in-jit loops, a varied
traced scalar per dispatch, and a host-readback completion barrier
(block_until_ready through the axon relay is NOT a barrier, and
identical dispatches are cache-served — see docs/STATUS.md perf log).

Usage:  python tools/bench_profile.py            # 512x128x128
        BENCH_NX=256 python tools/bench_profile.py

Phases reported (ms, per-iteration inside one jit):
  full         the whole advance (the bench number)
  adv_vel      compute_advecting_velocities (trace + MAC projection)
  cc_proj      the CC projection (spectral or MG by config)
  fft_solve    one spectral pressure solve
  mg_solve     one MG pressure solve (same rhs; the GSRB target)
  mg_vcycle    one V-cycle
  gsrb8        8 GSRB sweeps on the finest op (smoother speed-of-light)
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
    from __graft_entry__ import _build_level

    nx = int(os.environ.get("BENCH_NX", 512))
    ny = int(os.environ.get("BENCH_NY", 128))
    nz = int(os.environ.get("BENCH_NZ", 128))
    print(f"device: {jax.devices()[0].platform}  grid: {nx}x{ny}x{nz}")
    level, grid = _build_level(nx=nx, nz=nz, ny=ny, mg_eps=1e-5)
    s0 = level.initial_state()
    dt = jnp.asarray(0.01, jnp.float32)
    s1 = jax.jit(lambda s, d: level.advance(s, d))(s0, dt)

    # full step: the natural chained map
    per_iter(lambda s: level.advance(s, dt), s1, "full step", n_lo=1,
             n_hi=5)

    def folded(phase_out, s):
        """Consume a phase output into a same-shape state (chainable).
        Sums EVERY leaf — folding just one lets XLA dead-code-eliminate
        the rest of the phase."""
        acc = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(phase_out):
            acc = acc + jnp.sum(leaf)
        return dataclasses.replace(s, vel=s.vel * (1.0 + 1e-20 * acc))

    def preamble(s):
        """_advance_inner's setup through the advecting velocities."""
        import jax.numpy as jnp
        from somar_tpu.core.bc import fill_ghosts_cc
        from somar_tpu.physics.godunov import ADVECT_GROW, pad_valid_faces
        p = level.params
        grav = level._gravity_source(s.scalars)
        sponge_v, _ = level._sponge_source(s.vel, s.scalars, dt)
        visc_src = level._viscous_source(s.vel)
        grad_p = (level.projector.cc_grad_cart(s.pressure)
                  if p.is_incompressible else None)
        src_vel = tuple(
            (visc_src[m] if visc_src is not None
             else jnp.zeros(grid.shape, p.dtype))
            + grav[m]
            - (grad_p[m] if grad_p is not None else 0.0)
            + (sponge_v[m] if sponge_v is not None else 0.0)
            for m in range(grid.ndim))
        u_mapped = level.geo.to_mapped(s.vel)
        level._u_pad = [fill_ghosts_cc(u_mapped[d], grid,
                                       level.vel_bcs_trace[d],
                                       ADVECT_GROW)
                        for d in range(grid.ndim)]
        adv_vel, mac_phi = level.compute_advecting_velocities(
            s, src_vel, dt)
        level._adv_valid = adv_vel
        level._adv_pad = tuple(pad_valid_faces(adv_vel[d], grid, d)
                               for d in range(grid.ndim))
        return (u_mapped, adv_vel, src_vel, grav, sponge_v, grad_p)

    def cleanup():
        level._u_pad = None
        level._adv_pad = None
        level._adv_valid = None

    def p1(s):
        env = preamble(s)
        cleanup()
        return folded(env[1], s)

    def p2(s):
        env = preamble(s)
        out = level.get_new_scalars_and_lambda(s, dt)
        cleanup()
        return folded((env[1], out), s)

    def p3(s):
        env = preamble(s)
        u_mapped, adv_vel, src_vel, grav, sponge_v, grad_p = env
        scal = level.get_new_scalars_and_lambda(s, dt)
        vel = level.get_new_velocity(s, u_mapped, adv_vel, src_vel,
                                     grav, None, sponge_v, grad_p, dt)
        cleanup()
        return folded((scal, vel), s)

    t1 = per_iter(p1, s1, "P1 preamble+adv_vel", n_lo=1, n_hi=5)
    t2 = per_iter(p2, s1, "P2 = P1 + scal_lam", n_lo=1, n_hi=5)
    t3 = per_iter(p3, s1, "P3 = P2 + velocity", n_lo=1, n_hi=5)
    print(f"{'  scal_lam (P2-P1)':44s} {t2 - t1:8.3f} ms")
    print(f"{'  velocity (P3-P2)':44s} {t3 - t2:8.3f} ms")

    per_iter(lambda s: folded(level.projector.project_cc(
        s.vel, level.vel_bcs_trace, phi0=s.cc_phi)[0], s), s1,
        "cc_proj", n_lo=1, n_hi=5)

    rhs = jax.jit(level.cell_divergence)(s1)
    if level.projector.fft is not None:
        per_iter(lambda r: level.projector.fft.solve(r), rhs,
                 "fft_solve")
    mg = level.projector.mg
    _, (its, rel) = jax.jit(lambda r: mg.solve(r, singular=True))(rhs)
    print(f"(mg_solve: {int(its)} V-cycles to rel={float(rel):.2e})")
    per_iter(lambda r: mg.solve(r, singular=True)[0], rhs, "mg_solve",
             n_lo=1, n_hi=4)
    per_iter(lambda r: mg._vcycle(0, jnp.zeros_like(r), r, 0.0, 1.0,
                                  True), rhs, "mg_vcycle", n_lo=1, n_hi=4)
    op = mg.ops[0]
    per_iter(lambda r: op.relax(jnp.zeros_like(r), r, 0.0, 1.0, 8,
                                "gsrb"), rhs, "gsrb8")
    nbytes = 4 * rhs.size
    print(f"(one gsrb sweep moves >= ~{3 * nbytes / 1e6:.0f} MB; "
          f"v5e HBM ~ 800 GB/s => floor ~ {3 * nbytes / 800e9 * 1e3:.2f} "
          f"ms/sweep)")


if __name__ == "__main__":
    main()
