"""Per-piece TPU profiling of the MG-512 pressure solve (round-5 lever).

Round-4 measured ~52.8 ms/solve = 5 V-cycles x ~10.6 ms at 512x128x128
against a ~1.6 ms/cycle HBM roofline estimate; this tool attributes the
per-cycle cost so the fusion work targets the real sinks.

Per-dispatch latency through the axon relay is large (measured ~24 ms
under host contention), so single pieces are timed as the DIFFERENCE
between an N-iteration and an M-iteration in-jit loop — the loop body
chains its output into its input, so nothing can be cache-served.

Usage: python tools/profile_mg.py          # 512x128x128
       BENCH_NX=256 python tools/profile_mg.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing import per_iter, time_dispatch, sync  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from somar_tpu.core.grid import Grid
    from somar_tpu.geometry.geo_source import CartesianMap
    from somar_tpu.geometry.level_geometry import build_level_geometry
    from somar_tpu.core.bc import FieldBCs, BC
    from somar_tpu.solvers.multigrid import (LevelMultigrid, MGParams,
                                             prolong_linear_mg)

    nx = int(os.environ.get("BENCH_NX", 512))
    ny = int(os.environ.get("BENCH_NY", 128))
    nz = int(os.environ.get("BENCH_NZ", 128))
    Lx, Ly, Lz = 15.0, 2.0, 2.0
    grid = Grid(nx=(nx, ny, nz), dx=(Lx / nx, Ly / ny, Lz / nz),
                x0=(-Lx / 2, 0.0, 0.0), periodic=(False, True, False))
    geo = build_level_geometry(grid, CartesianMap())
    bcs = FieldBCs.from_periodic(grid, BC.neumann())
    mg = LevelMultigrid(geo, bcs, MGParams(eps=1e-5, imax=12))
    print(f"device: {jax.devices()[0].platform}  grid: {grid.shape}")
    print("MG depth:", mg.depth, " ratios:", mg.ratios)

    key = jax.random.PRNGKey(0)
    rhs = jax.random.normal(key, grid.shape, jnp.float32)
    rhs = rhs - jnp.mean(rhs)

    solve = jax.jit(lambda r: mg.solve(r, singular=True))
    phi, info = solve(rhs)
    print("solve iters:", int(info[0]), " relres:", float(info[1]))
    t_solve = time_dispatch(solve,
                            lambda i: (rhs * (1.0 + 1e-5 * i),))
    print(f"{'full solve dispatch':32s} {t_solve:8.3f} ms")

    # per-cycle cost from the solve itself (wrapping _vcycle in an
    # extra fori_loop doubles Mosaic's scoped-vmem stack and OOMs)
    print(f"{'per V-cycle (solve/iters)':32s} "
          f"{t_solve / max(1, int(info[0])):8.3f} ms  (incl dispatch)")

    # per-level pieces, chained maps
    r_l = rhs
    for lev in range(min(4, mg.depth - 1)):
        op = mg.ops[lev]
        sh = op.grid.shape
        ratio = mg.ratios[lev]
        p0 = jnp.zeros(sh, jnp.float32)
        per_iter(lambda p, _op=op, _r=r_l: _op.relax(p, _r, 0.0, 1.0, 1,
                                                     mg.modes[lev]),
                 p0, f"L{lev} {sh} relax x1")
        per_iter(lambda p, _op=op, _r=r_l: _op.relax(p, _r, 0.0, 1.0, 4,
                                                     mg.modes[lev]),
                 p0, f"L{lev} {sh} relax x4")
        per_iter(lambda p, _op=op, _r=r_l: _r - _op.residual(
            p, _r, 0.0, 1.0), p0, f"L{lev} {sh} residual")
        # restrict+prolong chained at constant shape: down then up
        per_iter(lambda p, _l=lev, _rt=ratio, _op=op: prolong_linear_mg(
            mg._restrict_residual(_l, p, _rt), _op.grid, _rt,
            _op.grid.periodic), p0, f"L{lev} restrict+prolong")
        r_l = jax.jit(lambda r, _l=lev, _rt=ratio: mg.
                      _restrict_residual(_l, r, _rt))(r_l)

    # fine-level residual norm (the while_loop's per-cycle overhead)
    per_iter(lambda p: p * (1.0 / (1e-30 + mg.ops[0].norm(
        mg.ops[0].residual(p, rhs, 0.0, 1.0)))), phi,
             "fine residual+norm")


if __name__ == "__main__":
    main()
