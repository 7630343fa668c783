"""Production-resolution physics parity run (BASELINE.md north star).

Runs the 3D lock exchange at the 512x128x128 benchmark resolution on the
real chip for a physical horizon (t ~ 4), and records the two
diagnostics the north star requires to MATCH the reference's physics:

  * gravity-current front speed: Froude number Fr = U / sqrt(g'H)
    against the literature bracket (Benjamin's inviscid energy-conserving
    current Fr = 0.5; free-slip simulations track ~0.5-0.6; no-slip
    experiments ~0.45) — the same bracket the reference's lock-exchange
    demo is validated against (README.md:61-67);
  * total-energy decay: E(t) monotone non-increasing after the f32
    projection transient (the flow is freely-evolving; any energy growth
    is a numerics bug).

Writes docs/PARITY_512.json:
  {"grid", "steps", "dt", "fr", "front_xl", "E0", "E_final",
   "energy_monotone", "ms_per_step"}

Usage: python tools/parity512.py            (TPU; ~30 s after compile)
       PARITY_STEPS=80 BENCH_NX=128 ... python tools/parity512.py (smoke)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from somar_tpu.utils.cache import compile_cache_dir
    cache = compile_cache_dir(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from __graft_entry__ import _build_level
    from somar_tpu.problems.lock_exchange import front_positions

    nx = int(os.environ.get("BENCH_NX", 512))
    ny = int(os.environ.get("BENCH_NY", 128))
    nz = int(os.environ.get("BENCH_NZ", 128))
    nsteps = int(os.environ.get("PARITY_STEPS", 320))
    dtv = float(os.environ.get("PARITY_DT", 0.0125))

    level, grid = _build_level(nx=nx, nz=nz, ny=ny, mg_eps=1e-5)
    print(f"# device={jax.devices()[0].platform} grid={grid.nx} "
          f"steps={nsteps} dt={dtv}", file=sys.stderr)
    state = level.post_initialize(level.initial_state())
    state = level.initialize_pressure(state, jnp.asarray(dtv, jnp.float32))
    step = jax.jit(lambda s, d: level.advance(s, d))
    dt = jnp.asarray(dtv, jnp.float32)

    e0 = float(level.total_energy(state))
    ts, xls, es = [], [], []
    t0 = time.perf_counter()
    state = step(state, dt)
    jax.block_until_ready(state)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(1, nsteps):
        state = step(state, dt)
        if (i + 1) % 20 == 0:
            _, xl = front_positions(state.scalars[0], level.geo)
            ts.append(float(state.time))
            xls.append(float(xl))
            es.append(float(level.total_energy(state)))
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0
    ms = 1e3 * elapsed / (nsteps - 1)

    ts_a, xls_a = np.array(ts), np.array(xls)
    m = ts_a >= 1.0
    speed = float(np.polyfit(ts_a[m], xls_a[m], 1)[0]) if m.sum() >= 2 \
        else float("nan")
    # LockExchange scaling: g' = 1, H = Lz = 2
    fr = speed / np.sqrt(2.0)
    es_a = np.array([e0] + es)
    monotone = bool(np.all(np.diff(es_a[1:]) <= 0.0))

    out = {
        "grid": list(grid.nx), "steps": nsteps, "dt": dtv,
        "fr": round(fr, 4), "front_xl": round(xls[-1], 4),
        "E0": e0, "E_final": es[-1], "energy_monotone": monotone,
        "ms_per_step": round(ms, 2), "compile_s": round(compile_s, 1),
        "device": jax.devices()[0].platform,
        "front_trajectory": {"t": [round(t, 3) for t in ts],
                             "xl": [round(x, 4) for x in xls]},
        "energy": [round(e, 4) for e in es],
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "docs", "PARITY_512.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("grid", "fr", "front_xl", "E0", "E_final",
                       "energy_monotone", "ms_per_step")}))
    ok = (0.4 < fr < 0.7) and monotone
    print(f"# parity {'OK' if ok else 'FAILED'}: Fr={fr:.3f} "
          f"(bracket 0.45-0.65), energy monotone={monotone}",
          file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
