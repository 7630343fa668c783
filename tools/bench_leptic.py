"""Leptic-vs-MG A/B in the leptic solver's DESIGN regime (VERDICT r4 #8).

Round-4's A/B ran on the BeamGeneration config (aspect ~ 1 vertical
cells) and measured leptic non-competitive (107 ms vs 7 ms).  That is
not the solver's regime: the leptic expansion converges like
eps = (H/L)^2, so it wants a truly FLAT box — kilometers wide, tens of
meters deep — with Neumann vertical BCs (reference:
LevelLepticSolver.H:41-52).  This tool measures both solvers on such a
box (default 2048 x 2048 x 32, H/L = 1/64 per unit length) on one chip,
and records the verdict for the README policy line.

Timing discipline: tools/timing.py (chained in-jit loops, varied traced
scalar, readback barrier).

Usage:  python tools/bench_leptic.py                    # 2048x2048x32
        LEPTIC_NX=1024 LEPTIC_NZ=32 python tools/bench_leptic.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing import per_iter, time_dispatch  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from somar_tpu.core.bc import BC, FieldBCs
    from somar_tpu.core.grid import Grid
    from somar_tpu.geometry.geo_source import CartesianMap
    from somar_tpu.geometry.level_geometry import build_level_geometry
    from somar_tpu.solvers.leptic import LepticParams, LevelLepticSolver
    from somar_tpu.solvers.multigrid import LevelMultigrid, MGParams

    nx = int(os.environ.get("LEPTIC_NX", 2048))
    ny = int(os.environ.get("LEPTIC_NY", nx))
    nz = int(os.environ.get("LEPTIC_NZ", 32))
    # leptic regime (Scotti & Santilli 2011, the paper cited at
    # LevelLepticSolver.H:42): the expansion parameter is
    # eps = (H / dx_horizontal)^2 — the method converges when grid
    # columns are WIDER than the domain is deep.  Flat ocean box with
    # dx_h = 2H -> eps = 0.25 (e.g. 1 km depth, 2 km horizontal cells).
    H = 1.0
    dxh = 2.0 * H
    Lx, Ly = dxh * nx, dxh * ny
    grid = Grid(nx=(nx, ny, nz), dx=(dxh, dxh, H / nz),
                x0=(0.0, 0.0, 0.0), periodic=(False, False, False))
    geo = build_level_geometry(grid, CartesianMap())
    bcs = FieldBCs.uniform(BC.neumann(), 3)
    eps = 1e-6
    print(f"device: {jax.devices()[0].platform}  grid: {grid.shape}  "
          f"H/L = {H / Lx:.4g}  eps_leptic = {(H / dxh) ** 2:.2f}")

    key = jax.random.PRNGKey(0)
    rhs = jax.random.normal(key, grid.shape, jnp.float32)
    rhs = rhs - jnp.mean(rhs)

    out = {"grid": [nx, ny, nz], "H_over_L": H / Lx, "eps": eps}

    lep = LevelLepticSolver(geo, bcs, LepticParams(eps=eps, max_order=20))
    lsolve = jax.jit(lambda r: lep.solve(r))
    phi_l, (orders, relres, status) = lsolve(rhs)
    print(f"leptic: status={int(status)} orders={int(orders)} "
          f"relres={float(relres):.2e}")
    t_l = time_dispatch(lsolve, lambda i: (rhs * (1.0 + 1e-5 * i),))
    print(f"{'leptic solve dispatch':32s} {t_l:8.2f} ms")
    out["leptic"] = {"ms": round(t_l, 2), "orders": int(orders),
                     "relres": float(relres), "status": int(status)}

    mg = LevelMultigrid(geo, bcs, MGParams(eps=eps, imax=20))
    msolve = jax.jit(lambda r: mg.solve(r, singular=True))
    phi_m, info = msolve(rhs)
    print(f"mg: iters={int(info[0])} relres={float(info[1]):.2e} "
          f"depth={mg.depth} modes={mg.modes[:3]}...")
    t_m = time_dispatch(msolve, lambda i: (rhs * (1.0 + 1e-5 * i),))
    print(f"{'mg solve dispatch':32s} {t_m:8.2f} ms")
    out["mg"] = {"ms": round(t_m, 2), "iters": int(info[0]),
                 "relres": float(info[1]), "depth": mg.depth}

    # solutions agree (up to the Neumann gauge)
    d = (phi_l - jnp.mean(phi_l)) - (phi_m - jnp.mean(phi_m))
    scale = jnp.max(jnp.abs(phi_m - jnp.mean(phi_m)))
    agree = float(jnp.max(jnp.abs(d)) / scale)
    print(f"solution agreement (gauge-free, rel): {agree:.2e}")
    out["rel_solution_diff"] = agree
    out["winner"] = "leptic" if t_l < t_m else "mg"
    out["speedup"] = round(max(t_l, t_m) / max(1e-9, min(t_l, t_m)), 2)
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "docs", "LEPTIC_AB.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
