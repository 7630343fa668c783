"""Benchmark: 3D lock exchange cell-updates/sec on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline metric (BASELINE.md): cell-updates/sec/chip for the full
Navier-Stokes step (advection + MAC/CC projections + implicit
viscosity/diffusion) on the 3D lock-exchange configuration, with the
spectral pressure fast path (uniform Cartesian).

Secondary paths (the solver machinery the reference actually exercises on
its mapped/AMR configs; reported in "extra" and on stderr):
  * mg     — the same 512-class Cartesian step with the pressure solver
             FORCED to multigrid (GSRB V-cycles, the reference's
             MappedAMRMultiGrid analog);
  * mapped — the shipped BeamGeneration config (terrain-following
             BeamGeneratorMap metric, non-diagonal Jgup MG solves);
  * amr    — the shipped 3D lock-exchange config with maxlevel=1
             (subcycled 4x-refined patch, composite sync projection).

vs_baseline: measured single-core CPU proxy (BASELINE_MEASURED.json,
produced by `python bench.py --measure-baseline`): the same full NS step
run on ONE CPU core via JAX_PLATFORMS=cpu with XLA's intra-op parallelism
pinned to 1 thread.  The reference itself cannot be built here (its
Chombo library is not vendored and the container has no network), so
this documented proxy stands in for the reference's own per-run
instrumentation (LepticAMR.cpp:692-708) — method details in BASELINE.md.
Falls back to the 2.0e6 cups assumed Chombo/MPI-core figure when the
measured file is absent.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ASSUMED_CPU_BASELINE = 2.0e6  # cell-updates/sec, Chombo/MPI single core
_HERE = os.path.dirname(os.path.abspath(__file__))
_MEASURED = os.path.join(_HERE, "BASELINE_MEASURED.json")


def _note(msg: str):
    print(msg, file=sys.stderr)


def _baseline_cups() -> tuple:
    if os.path.exists(_MEASURED):
        with open(_MEASURED) as f:
            d = json.load(f)
        return float(d["cups"]), d.get("method", "measured")
    return ASSUMED_CPU_BASELINE, "assumed"


def _time_steps(step, state, dt, nsteps, label):
    """Compile once, then time nsteps; returns (cups_denominator-free
    elapsed seconds, compile seconds, final state)."""
    import jax
    t0 = time.perf_counter()
    state = step(state, dt)
    jax.block_until_ready(state)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(nsteps):
        state = step(state, dt)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0
    _note(f"# [{label}] compile={compile_s:.1f}s "
          f"ms/step={1e3 * elapsed / nsteps:.1f}")
    return elapsed, compile_s, state


def _bench_level(level, grid, nsteps, label):
    import jax
    import jax.numpy as jnp
    state = level.initial_state()
    dt = jnp.asarray(0.01, jnp.float32)
    step = jax.jit(lambda s, d: level.advance(s, d))
    elapsed, compile_s, state = _time_steps(step, state, dt, nsteps, label)
    return grid.ncells * nsteps / elapsed, compile_s, state


def _bench_headline(nsteps):
    from __graft_entry__ import _build_level
    nx = int(os.environ.get("BENCH_NX", 512))
    ny = int(os.environ.get("BENCH_NY", 128))
    nz = int(os.environ.get("BENCH_NZ", 128))
    level, grid = _build_level(nx=nx, nz=nz, ny=ny, mg_eps=1e-5)
    cups, compile_s, state = _bench_level(level, grid,
                                          nsteps, f"fft {grid.nx}")
    # secondary BASELINE.md metric: pressure-Poisson solve ms/step
    import jax
    import jax.numpy as jnp
    proj = jax.jit(lambda v, s: level.projector.project_cc(
        v, level.vel_bcs_trace, phi0=s.cc_phi)[0])
    out = proj(state.vel, state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(nsteps):
        out = proj(state.vel, state)
    jax.block_until_ready(out)
    poisson_ms = 1e3 * (time.perf_counter() - t0) / nsteps
    _note(f"# [fft] pressure-solve={poisson_ms:.2f} ms/step")
    return cups, {"grid": list(grid.nx), "poisson_ms": round(poisson_ms, 2)}


def _bench_mg(nsteps):
    """The 512-class Cartesian step with the pressure solver forced to
    multigrid (what the reference's GSRB/ChF hot loops do)."""
    import dataclasses
    import jax.numpy as jnp
    from somar_tpu.core.grid import Grid
    from somar_tpu.geometry.geo_source import CartesianMap
    from somar_tpu.geometry.level_geometry import build_level_geometry
    from somar_tpu.physics.navier_stokes import NSLevel, NSParams
    from somar_tpu.problems.lock_exchange import LockExchange
    from somar_tpu.solvers.multigrid import MGParams

    nx = int(os.environ.get("BENCH_NX", 512))
    ny = int(os.environ.get("BENCH_NY", 128))
    nz = int(os.environ.get("BENCH_NZ", 128))
    Lx, Ly, Lz = 15.0, 2.0, 2.0
    grid = Grid(nx=(nx, ny, nz), dx=(Lx / nx, Ly / ny, Lz / nz),
                x0=(-Lx / 2, 0.0, 0.0), periodic=(False, True, False))
    geo = build_level_geometry(grid, CartesianMap())
    params = NSParams(nu=1e-4, kappa=(1e-4,), gravity_method=1, cfl=0.9,
                      pressure_solver="mg",
                      mg=MGParams(eps=1e-5, imax=12))
    level = NSLevel(geo, LockExchange(), params)
    cups, _, state = _bench_level(level, grid, nsteps, f"mg {grid.nx}")
    # BASELINE.md secondary metric: pressure-Poisson solve ms/step, MG path
    # (the reference's MappedAMRMultiGrid hot loop) next to the fft number
    import jax
    proj = jax.jit(lambda v, s: level.projector.project_cc(
        v, level.vel_bcs_trace, phi0=s.cc_phi)[0])
    out = proj(state.vel, state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(nsteps):
        out = proj(state.vel, state)
    jax.block_until_ready(out)
    poisson_ms = 1e3 * (time.perf_counter() - t0) / nsteps
    _note(f"# [mg] pressure-solve={poisson_ms:.2f} ms/step")
    return cups, {"grid": list(grid.nx), "poisson_ms": round(poisson_ms, 2)}


def _driver_from_config(path, overrides, tag):
    from somar_tpu.config.context import ProblemContext
    from somar_tpu.driver import RunDriver
    import tempfile
    ctx = ProblemContext.from_file(path, overrides)
    out = tempfile.mkdtemp(prefix=f"bench_{tag}_")
    return RunDriver(ctx, out_dir=out)


def _bench_mapped(nsteps):
    """The shipped BeamGeneration config (its production resolution is
    commented in the input: 640x512): terrain-following metric, MG."""
    import jax
    import jax.numpy as jnp
    nx = int(os.environ.get("BENCH_BEAM_NX", 640))
    nz = int(os.environ.get("BENCH_BEAM_NZ", 512))
    drv = _driver_from_config(
        "/root/reference/exec/inputs.BeamGeneration.machine",
        [f"amr.nx={nx} {nz}", f"amr.nx_offset={-nx // 2} 0",
         "amr.maxlevel=0", "plot.plot_interval=-1",
         "plot.checkpoint_interval=-1", "amr.verbosity=0"], "beam")
    level = drv.level
    state = level.post_initialize(level.initial_state())
    dt = jnp.asarray(1.0, jnp.float32)
    solver = level.projector.method
    _note(f"# [mapped] pressure solver: {solver}")
    elapsed, _, _ = _time_steps(drv._step_fn, state, dt, nsteps,
                                f"mapped beam {drv.grid.nx}")
    return drv.grid.ncells * nsteps / elapsed, {
        "grid": list(drv.grid.nx), "solver": solver}


def _bench_amr(nsteps):
    """The shipped 3D lock exchange with maxlevel=1 (4 1 1 refinement):
    subcycled patch advance + composite sync projection."""
    import numpy as np
    import jax.numpy as jnp
    drv = _driver_from_config(
        "/root/reference/exec/inputs.LockExchange_Cartesian3D.machine",
        ["plot.plot_interval=-1", "plot.checkpoint_interval=-1",
         "amr.verbosity=0", "amr.maxsteps=2"], "amr")
    h = drv.hierarchy
    level0 = h.level0
    state = level0.post_initialize(level0.initial_state())
    got = h.initial_patch_states(state)
    if h.multi_patch:
        fine, origin, weights = got
    else:
        (fine, origin), weights = got, None
    dt = jnp.asarray(0.01, jnp.float32)

    import jax
    step = drv._amr_step_fn
    t0 = time.perf_counter()
    state, fine = step(state, fine, origin, dt, h.geo_bundles, weights)
    jax.block_until_ready(state)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(nsteps):
        state, fine = step(state, fine, origin, dt, h.geo_bundles, weights)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0
    updates = drv.grid.ncells
    subs = []
    factor = 1
    for c in h.couplings:
        factor *= c.nt
        subs.append(factor)
        updates += factor * c.K * int(np.prod(c.ext_nx))
    _note(f"# [amr] compile={compile_s:.1f}s "
          f"ms/coarse-step={1e3 * elapsed / nsteps:.1f} "
          f"levels={h.num_levels}")
    return updates * nsteps / elapsed, {
        "grid": list(drv.grid.nx), "levels": h.num_levels}


def measure_baseline():
    """One-time CPU single-core proxy measurement (see module docstring).
    Writes BASELINE_MEASURED.json; run on any host with this repo."""
    nx = int(os.environ.get("BENCH_NX", 512))
    ny = int(os.environ.get("BENCH_NY", 128))
    nz = int(os.environ.get("BENCH_NZ", 128))
    nsteps = int(os.environ.get("BASELINE_STEPS", 2))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["OMP_NUM_THREADS"] = "1"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_cpu_multi_thread_eigen=false"
                          " intra_op_parallelism_threads=1").strip()
    code = f"""
import time, json
import jax, jax.numpy as jnp
from __graft_entry__ import _build_level
level, grid = _build_level(nx={nx}, nz={nz}, ny={ny}, mg_eps=1e-5)
state = level.initial_state()
dt = jnp.asarray(0.01, jnp.float32)
step = jax.jit(lambda s, d: level.advance(s, d))
state = step(state, dt); jax.block_until_ready(state)
t0 = time.perf_counter()
for _ in range({nsteps}):
    state = step(state, dt)
jax.block_until_ready(state)
el = time.perf_counter() - t0
print(json.dumps(dict(cups=grid.ncells * {nsteps} / el,
                      ms_per_step=1e3 * el / {nsteps},
                      grid=list(grid.nx), steps={nsteps})))
"""
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=_HERE,
                       capture_output=True, text=True)
    if r.returncode != 0:
        _note(r.stderr)
        raise SystemExit(1)
    d = json.loads(r.stdout.strip().splitlines()[-1])
    d["method"] = ("single-core CPU proxy: same jitted NS step, "
                   "JAX_PLATFORMS=cpu, XLA intra-op threads=1 "
                   "(see BASELINE.md)")
    with open(_MEASURED, "w") as f:
        json.dump(d, f, indent=1)
    _note(f"# baseline measured: {d['cups']:.4g} cups "
          f"({d['ms_per_step']:.0f} ms/step on {d['grid']})")


def _backend_watchdog():
    """The axon TPU tunnel can be down/hung; jax.devices() then BLOCKS
    instead of erroring.  Probe the backend in a subprocess with a hard
    timeout; on failure RE-EXEC the bench with the axon env scrubbed
    (the plugin blocks at import while any AXON var points at the dead
    tunnel) so the round still records a degraded CPU artifact."""
    if os.environ.get("SOMAR_BENCH_DEGRADED"):
        return "cpu-fallback", True
    try:
        # NOTE: no capture_output+timeout combo here — the axon plugin
        # spawns tunnel helpers that inherit the pipes, and after a
        # timeout-kill subprocess.run blocks FOREVER waiting for those
        # fds to close (observed: bench hung 50 min in this probe).
        # Write to a file instead; kill the whole process group.
        import tempfile
        with tempfile.TemporaryFile() as out:
            proc = subprocess.Popen(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                stdout=out, stderr=subprocess.DEVNULL,
                env=dict(os.environ), start_new_session=True)
            try:
                rc = proc.wait(timeout=300)
            except subprocess.TimeoutExpired:
                import signal as _sig
                os.killpg(proc.pid, _sig.SIGKILL)
                proc.wait()
                raise
            out.seek(0)
            text = out.read().decode().strip()
        if rc == 0 and text:
            return text.splitlines()[-1], False
        _note("# TPU backend unavailable (probe failed); degraded "
              "CPU-fallback bench")
    except subprocess.TimeoutExpired:
        _note("# TPU backend probe HUNG; degraded CPU-fallback bench")
    env = {k: v for k, v in os.environ.items()
           if not (k.startswith("PALLAS_AXON") or k.startswith("AXON")
                   or k.startswith("TPU_"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["SOMAR_BENCH_DEGRADED"] = "1"
    env.setdefault("BENCH_STEPS", "1")
    env.setdefault("BENCH_PATHS", "fft")
    # shrink the grid: the artifact's job in this mode is to exist and
    # be honest, not to be a chip number
    env.setdefault("BENCH_NX", "128")
    env.setdefault("BENCH_NY", "32")
    env.setdefault("BENCH_NZ", "32")
    r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env, timeout=1800)
    sys.exit(r.returncode)


def main():
    platform, degraded = _backend_watchdog()
    nsteps = int(os.environ.get("BENCH_STEPS", 5))
    paths = os.environ.get("BENCH_PATHS", "fft,mg,mapped,amr").split(",")

    import jax
    # persistent compilation cache: the 512-class step costs minutes to
    # compile cold; cache hits bring reruns to seconds
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(_HERE, ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    base_cups, base_method = _baseline_cups()
    cups, extra = _bench_headline(nsteps)
    extra_all = {"fft": extra, "baseline_method": base_method,
                 "baseline_cups": base_cups,
                 "device": jax.devices()[0].platform}
    if degraded:
        extra_all["degraded"] = ("TPU backend unavailable at bench "
                                 "time; CPU fallback, NOT a chip number")
    for name, fn in (("mg", _bench_mg), ("mapped", _bench_mapped),
                     ("amr", _bench_amr)):
        if name not in paths:
            continue
        try:
            c, info = fn(nsteps)
            info["cups"] = round(c, 1)
            info["vs_baseline"] = round(c / base_cups, 2)
            extra_all[name] = info
        except Exception as e:  # a secondary path must not kill the bench
            _note(f"# [{name}] FAILED: {type(e).__name__}: {e}")
            extra_all[name] = {"error": str(e)[:200]}

    result = {
        "metric": "cell-updates/sec/chip (3D lock exchange)",
        "value": round(cups, 1),
        "unit": "cell-updates/s",
        "vs_baseline": round(cups / base_cups, 2),
        "extra": extra_all,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if "--measure-baseline" in sys.argv:
        measure_baseline()
    else:
        main()
