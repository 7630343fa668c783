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


# ---------------------------------------------------------------- honesty
# Round-4 shipped a physically impossible MG number (0.1 ms "step" at
# 512x128x128 = 222261x baseline) because identical-args timing loops are
# served from a relay cache (documented in STATUS round 1) and nothing
# sanity-checked the output.  Three defenses, all mandatory for every
# timed path:
#   1. vary an input VALUE every timed call (no retrace, defeats the
#      cache);
#   2. fingerprint the output and refuse timings whose state never
#      changed across steps;
#   3. a physics floor: a full NS step must move >= STEP_BYTES_MIN
#      bytes/cell through HBM, a Poisson solve >= SOLVE_BYTES_MIN; any
#      ms/step below ncells*bytes/HBM_BW_CEIL is impossible on this
#      hardware and is REFUSED (reported as an error, not a number).
HBM_BW_CEIL = 2.0e12     # B/s; generously above any v5e/v5p/v6e part
STEP_BYTES_MIN = 64      # read+write of the ~9-field NS state alone
SOLVE_BYTES_MIN = 16     # phi read+write plus rhs read, one pass


class ImplausibleTiming(RuntimeError):
    pass


def _floor_ms(ncells: int, bytes_per_cell: float) -> float:
    return 1e3 * ncells * bytes_per_cell / HBM_BW_CEIL


def _sync(tree):
    """Completion barrier: a 4-byte readback of one output buffer.
    block_until_ready alone is NOT a barrier through the axon relay —
    measured returning in 0.03 ms from a 320 ms in-flight loop."""
    import jax
    import numpy as np
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)]))


def _fingerprint(tree) -> float:
    import jax
    import numpy as np
    tot = 0.0
    for leaf in jax.tree_util.tree_leaves(tree)[:2]:
        a = np.asarray(leaf).ravel()
        tot += float(np.abs(a[:: max(1, a.size // 4096)]).sum())
    return tot


def _stats_ms(times) -> dict:
    ms = sorted(1e3 * t for t in times)
    n = len(ms)
    med = ms[n // 2] if n % 2 else 0.5 * (ms[n // 2 - 1] + ms[n // 2])
    return {"ms": round(med, 2), "ms_min": round(ms[0], 2),
            "ms_max": round(ms[-1], 2)}


def _check_floor(stats: dict, ncells: int, bytes_per_cell: float,
                 label: str):
    floor = _floor_ms(ncells, bytes_per_cell)
    if stats["ms"] < floor:
        raise ImplausibleTiming(
            f"{label}: {stats['ms']:.3f} ms is below the HBM roofline "
            f"floor {floor:.3f} ms ({bytes_per_cell} B/cell at "
            f"{HBM_BW_CEIL:.0e} B/s) — measurement refused (cache "
            f"artifact?)")


def _time_steps(step, state, dt, nsteps, label, ncells):
    """Compile once, then time 3 samples of an nsteps chained-dispatch
    run (dt varied every call, one readback barrier per sample);
    returns (per-step sample times, compile seconds, final state).
    Raises ImplausibleTiming when the state does not evolve or the
    median beats the HBM roofline floor."""
    t0 = time.perf_counter()
    state = step(state, dt)
    _sync(state)
    compile_s = time.perf_counter() - t0
    fp0 = _fingerprint(state)
    samples = []
    k = 0
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(nsteps):
            k += 1
            state = step(state, dt * (1.0 + 1e-6 * k))
        _sync(state)
        samples.append((time.perf_counter() - t0) / nsteps)
    if _fingerprint(state) == fp0:
        raise ImplausibleTiming(
            f"{label}: state identical across {3 * nsteps} timed steps "
            f"— measurement refused")
    st = _stats_ms(samples)
    _check_floor(st, ncells, STEP_BYTES_MIN, label)
    _note(f"# [{label}] compile={compile_s:.1f}s ms/step={st['ms']:.1f} "
          f"[{st['ms_min']:.1f}, {st['ms_max']:.1f}]")
    return samples, compile_s, state


def _time_poisson(level, state, nsteps, label, ncells):
    """Pressure-Poisson solve ms/step with chained phi and varied vel
    (identical-args relay caching is what made r4's 0.04 ms fiction)."""
    import jax
    proj = jax.jit(lambda v, p: level.projector.project_cc(
        v, level.vel_bcs_trace, phi0=p)[1])
    phi = proj(state.vel, state.cc_phi)
    _sync(phi)
    fp0 = _fingerprint(phi)
    samples = []
    k = 0
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(nsteps):
            k += 1
            # 1% rhs change per solve — the per-step change a real run
            # sees, so the warm-started solve does representative work
            # (a smaller perturbation would let it exit at 0 cycles)
            phi = proj(state.vel * (1.0 + 1e-2 * k), phi)
        _sync(phi)
        samples.append((time.perf_counter() - t0) / nsteps)
    if _fingerprint(phi) == fp0:
        raise ImplausibleTiming(
            f"{label}: potential identical across timed solves "
            f"— measurement refused")
    st = _stats_ms(samples)
    _check_floor(st, ncells, SOLVE_BYTES_MIN, label)
    _note(f"# [{label}] pressure-solve={st['ms']:.2f} ms "
          f"[{st['ms_min']:.2f}, {st['ms_max']:.2f}]")
    return st


def _bench_level(level, grid, nsteps, label):
    import jax
    import jax.numpy as jnp
    state = level.initial_state()
    dt = jnp.asarray(0.01, jnp.float32)
    step = jax.jit(lambda s, d: level.advance(s, d))
    times, compile_s, state = _time_steps(step, state, dt, nsteps, label,
                                          grid.ncells)
    st = _stats_ms(times)
    cups = grid.ncells / (st["ms"] * 1e-3)
    return cups, compile_s, state, st


def _bench_headline(nsteps):
    from __graft_entry__ import _build_level
    nx = int(os.environ.get("BENCH_NX", 512))
    ny = int(os.environ.get("BENCH_NY", 128))
    nz = int(os.environ.get("BENCH_NZ", 128))
    level, grid = _build_level(nx=nx, nz=nz, ny=ny, mg_eps=1e-5)
    cups, compile_s, state, st = _bench_level(level, grid,
                                              nsteps, f"fft {grid.nx}")
    # device-only ms/step: N steps chained INSIDE one jit, timed by
    # loop-length difference — removes the per-dispatch relay latency
    # this tunnel adds (a production deployment without the relay runs
    # at the device number; both are recorded)
    try:
        import jax

        @jax.jit
        def chain(s, n, d):
            return jax.lax.fori_loop(
                0, n, lambda i, ss: level.advance(
                    ss, d * (1.0 + 1e-6 * i)), s)

        import jax.numpy as jnp
        d0 = jnp.asarray(0.01, jnp.float32)
        _sync(chain(state, 2, d0))
        ts = {}
        for n in (2, 6):
            t0 = time.perf_counter()
            _sync(chain(state, n, d0 * (1.0 + 1e-6 * n)))
            ts[n] = time.perf_counter() - t0
        dev_ms = 1e3 * (ts[6] - ts[2]) / 4.0
        st["ms_device"] = round(dev_ms, 2)
        _note(f"# [fft] device-only ms/step={dev_ms:.1f} "
              f"(in-jit chained)")
    except Exception as e:
        _note(f"# [fft] device-only measurement failed: {e}")
    # secondary BASELINE.md metric: pressure-Poisson solve ms/step
    psolve = _time_poisson(level, state, nsteps, "fft", grid.ncells)
    return cups, {"grid": list(grid.nx), "step": st,
                  "poisson_ms": psolve["ms"], "poisson": psolve}


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
    cups, _, state, st = _bench_level(level, grid, nsteps,
                                      f"mg {grid.nx}")
    # BASELINE.md secondary metric: pressure-Poisson solve ms/step, MG path
    # (the reference's MappedAMRMultiGrid hot loop) next to the fft number.
    # Cross-check: this solve runs >= 1 V-cycle of >= 8 GSRB half-sweeps,
    # so SOLVE_BYTES_MIN underestimates it by >10x; the floor still
    # catches cache-served fiction (r4: 0.04 ms)
    psolve = _time_poisson(level, state, nsteps, "mg", grid.ncells)
    return cups, {"grid": list(grid.nx), "step": st,
                  "poisson_ms": psolve["ms"], "poisson": psolve}


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
    times, _, _ = _time_steps(drv._step_fn, state, dt, nsteps,
                              f"mapped beam {drv.grid.nx}",
                              drv.grid.ncells)
    st = _stats_ms(times)
    return drv.grid.ncells / (st["ms"] * 1e-3), {
        "grid": list(drv.grid.nx), "solver": solver, "step": st}


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

    step = drv._amr_step_fn
    t0 = time.perf_counter()
    state, fine = step(state, fine, origin, dt, h.geo_bundles, weights)
    _sync(state)
    compile_s = time.perf_counter() - t0
    updates = drv.grid.ncells
    factor = 1
    for c in h.couplings:
        factor *= c.nt
        updates += factor * c.K * int(np.prod(c.ext_nx))
    fp0 = _fingerprint(state)
    samples = []
    k = 0
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(nsteps):
            k += 1
            state, fine = step(state, fine, origin,
                               dt * (1.0 + 1e-6 * k), h.geo_bundles,
                               weights)
        _sync(state)
        samples.append((time.perf_counter() - t0) / nsteps)
    if _fingerprint(state) == fp0:
        raise ImplausibleTiming(
            "amr: state identical across timed steps — refused")
    st = _stats_ms(samples)
    _check_floor(st, updates, STEP_BYTES_MIN, "amr")
    _note(f"# [amr] compile={compile_s:.1f}s "
          f"ms/coarse-step={st['ms']:.1f} "
          f"[{st['ms_min']:.1f}, {st['ms_max']:.1f}] "
          f"levels={h.num_levels}")
    return updates / (st["ms"] * 1e-3), {
        "grid": list(drv.grid.nx), "levels": h.num_levels, "step": st}


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
    from somar_tpu.utils.cache import compile_cache_dir
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               compile_cache_dir(
                                   os.path.join(_HERE, ".jax_cache")))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    base_cups, base_method = _baseline_cups()
    try:
        cups, extra = _bench_headline(nsteps)
    except ImplausibleTiming as e:
        # refuse to print a fictional headline (see honesty block above)
        print(json.dumps({
            "metric": "cell-updates/sec/chip (3D lock exchange)",
            "value": None, "unit": "cell-updates/s", "vs_baseline": None,
            "extra": {"error": f"implausible timing refused: {e}"}}))
        sys.exit(0)
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
