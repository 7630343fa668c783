"""Benchmark: 3D lock exchange cell-updates/sec on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric (BASELINE.md): cell-updates/sec/chip for the full Navier-Stokes
step (advection + MAC/CC projections + implicit viscosity/diffusion) on
the 3D lock-exchange configuration.

vs_baseline: the reference publishes no numbers (BASELINE.json
published={}).  We normalize against an assumed Chombo/MPI CPU baseline of
2.0e6 cell-updates/sec/core — the right order for a full incompressible
NS step with MG projection on one modern x86 core (SOMAR's own
instrumentation points, LepticAMR.cpp:692-708, measure exactly this
per-run).  The north-star target (>=50x on a v5e-8, i.e. >=6.25x per
chip) is then vs_baseline >= 6.25 on this single-chip benchmark.
"""

from __future__ import annotations

import json
import os
import sys
import time

ASSUMED_CPU_BASELINE = 2.0e6  # cell-updates/sec, Chombo/MPI single core


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_level

    # benchmark size: scaled to chip memory; the north-star resolution is
    # 512x128x128 effective on a v5e-8 => 512x128x16-ish per chip; we run
    # a whole-problem single-chip slab.
    # default = the BASELINE.md north-star resolution (512x128x128
    # effective, here as a single uniform grid on one chip)
    nx = int(os.environ.get("BENCH_NX", 512))
    ny = int(os.environ.get("BENCH_NY", 128))
    nz = int(os.environ.get("BENCH_NZ", 128))
    nsteps = int(os.environ.get("BENCH_STEPS", 5))

    level, grid = _build_level(nx=nx, nz=nz, ny=ny, mg_eps=1e-5)
    state = level.initial_state()
    dt = jnp.asarray(0.01, jnp.float32)

    step = jax.jit(lambda s, d: level.advance(s, d))

    # warmup / compile
    t0 = time.perf_counter()
    state = step(state, dt)
    jax.block_until_ready(state)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(nsteps):
        state = step(state, dt)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0

    ncells = grid.ncells
    cups = ncells * nsteps / elapsed
    result = {
        "metric": "cell-updates/sec/chip (3D lock exchange)",
        "value": round(cups, 1),
        "unit": "cell-updates/s",
        "vs_baseline": round(cups / ASSUMED_CPU_BASELINE, 2),
    }
    print(json.dumps(result))

    # secondary BASELINE.md metric: pressure-Poisson solve ms/step
    # (the spectral direct solve standing in for the reference's MG)
    proj = jax.jit(lambda v, s: level.projector.project_cc(
        v, level.vel_bcs_trace, phi0=s.cc_phi)[0])
    out = proj(state.vel, state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(nsteps):
        out = proj(state.vel, state)
    jax.block_until_ready(out)
    poisson_ms = 1e3 * (time.perf_counter() - t0) / nsteps
    print(f"# grid={grid.nx} steps={nsteps} elapsed={elapsed:.3f}s "
          f"ms/step={1e3 * elapsed / nsteps:.1f} "
          f"pressure-solve={poisson_ms:.2f} ms/step "
          f"compile={compile_s:.1f}s "
          f"device={jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
