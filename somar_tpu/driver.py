"""The run driver: time loop, dt assignment, plot/checkpoint cadence.

Re-design of `exec/somar.cpp` (main/nsrun, :109-311) + the single-level
responsibilities of LepticAMR::run (`src/MappedChombo/LepticAMR.cpp:715-848`):

  * dt assignment with init_dt_multiplier / max_dt_grow caps
    (LepticAMR::assignDt, :854-947);
  * plot_interval / plot_period / checkpoint_interval cadences (:776-795);
  * a `halt` file polled every step (AMRNavierStokesAdvance.cpp:46-52) and
    a SIGINT handler that finishes the current step cleanly
    (LepticAMR.cpp:731-846);
  * the concluding report: total cell updates, cell-updates/sec, wall
    clock per step (LepticAMR::conclude, :660-713) — the reference's own
    benchmark instrumentation points (BASELINE.md).

The multi-level (subcycled AMR) driver extends this in somar_tpu/amr.
"""

from __future__ import annotations

import os
import signal
import time
from typing import Optional

import numpy as np


class RunDriver:
    def __init__(self, ctx, out_dir: str = "."):
        import jax
        import jax.numpy as jnp
        from somar_tpu.geometry.level_geometry import build_level_geometry
        from somar_tpu.physics.navier_stokes import NSLevel

        self.ctx = ctx
        self.out_dir = out_dir
        self.grid = ctx.base_grid()
        self.geo = build_level_geometry(self.grid, ctx.new_geo_source(),
                                        dtype=ctx.ns.dtype)
        self.problem = ctx.new_problem()
        self.hierarchy = None
        if ctx.amr.max_level >= 1:
            from somar_tpu.amr.hierarchy import AMRHierarchy
            from somar_tpu.amr.tagging import TagParams
            tagp = TagParams(
                buoyancy_tag_tol=ctx.amr.buoyancy_tag_tol,
                vel_tag_tol=ctx.amr.vel_tag_tol,
                magvort_tag_quota=ctx.amr.magvort_tag_quota,
                pressure_tag_tol=ctx.amr.pressure_tag_tol,
                vort_tag_tol=ctx.amr.vort_tag_tol,
                do_ri_tagging=ctx.amr.do_ri_tagging,
                ri_tag_tol=ctx.amr.ri_tag_tol,
                tags_grow=ctx.amr.tags_grow,
                fill_ratio=ctx.amr.fill_ratio,
                block_factor=ctx.amr.block_factor,
                vert_extrude=ctx.amr.vert_extrude_tags)
            reflux = tuple(
                name for flag, name in (
                    (ctx.amr.advective_momentum_reflux, "vel"),
                    (ctx.amr.advective_scalar_reflux, "scalars"),
                    (ctx.amr.advective_lambda_reflux, "lam")) if flag)
            self.hierarchy = AMRHierarchy(
                self.geo, self.problem, ctx.ns,
                ratios=list(ctx.amr.ref_ratios[:ctx.amr.max_level]),
                tag_params=tagp, reflux=reflux,
                implicit_reflux=(ctx.amr.implicit_scalar_reflux
                                 or ctx.amr.implicit_momentum_reflux),
                regrid_smoothing_coeff=ctx.amr.regrid_smoothing_coeff,
                num_patches=ctx.amr.max_patches,
                use_subcycling=ctx.amr.use_subcycling,
                max_grid_size=ctx.amr.max_grid_size,
                # applySyncCorrection=False means "solve but do not
                # apply" in the reference (AMRCCProjector.cpp:339); in
                # the functional model an unapplied solve is dead work,
                # so the gate folds into do_sync_projection
                do_sync_projection=(ctx.amr.do_sync_projection
                                    and ctx.amr.apply_sync_correction),
                grid_buffer_size=ctx.amr.grid_buffer_size,
                sync_projection_iters=ctx.amr.sync_projection_iters,
                sync_composite_iters=ctx.amr.sync_composite_iters,
                eta_lambda=(ctx.amr.eta_lambda
                            if ctx.amr.apply_vd_correction else 0.0))
            self.level = self.hierarchy.level0
            self._amr_step_fn = jax.jit(self.hierarchy.advance,
                                        static_argnames=("nt_mults",))
            self._amr_dt_fn = jax.jit(self.hierarchy.compute_dt)
            self._amr_leveldt_fn = jax.jit(self.hierarchy.level_dts)
            # per-level regrid cadence (reference: LepticAMR::needToRegrid
            # consults regrid_intervals[level]; regrid(lbase) then re-meshes
            # levels lbase+1..finest, LepticAMR.cpp:1188-1215)
            ivs = list(ctx.amr.regrid_intervals) or [10]
            self.regrid_intervals = [
                int(ivs[min(lev, len(ivs) - 1)])
                for lev in range(len(self.hierarchy.couplings))]
        else:
            self.level = NSLevel(self.geo, self.problem, ctx.ns)
        self._step_fn = jax.jit(lambda s, dt: self.level.advance(s, dt))
        self._dt_fn = jax.jit(self.level.compute_dt)
        # multi-chip: rank-transparent domain decomposition (the mpirun
        # analog, SURVEY.md section 5.8).  With several devices the state
        # shards over the horizontal mesh; GSPMD partitions the jnp step,
        # and single-level uniform PPM runs upgrade to the shard_map
        # advection-island step so the Pallas kernels run shard-local
        self.mesh = None
        self._shard_state = None
        ndev = len(jax.devices())
        if ndev > 1:
            from somar_tpu.parallel.mesh import make_mesh, shard_ns_state
            use_island = (self.hierarchy is None and self.geo.is_uniform
                          and ctx.ns.update_scheme == "ppm"
                          and ctx.ns.nonlinear_differencing_form == 0)
            # 3D runs decompose BOTH horizontal directions (the
            # near-square (ny, nx) factorization — ICI-friendly 2D
            # torus); 2D domains only have x to shard.  amr.splitDirs
            # masks which directions the decomposition may chop
            # (reference: LoadBalance's box-chopping dirs; the vertical
            # is never sharded regardless — line solves keep whole
            # columns)
            split = ctx.amr.split_dirs
            allow_y = (self.grid.ndim == 3 and len(split) > 1
                       and split[1])
            allow_x = not split or split[0]
            if allow_x and allow_y and ndev >= 4:
                axes = ("y", "x")
            elif allow_x:
                axes = ("x",)
            elif allow_y:
                axes = ("y",)
            else:
                axes = ("x",)   # nothing choppable: degenerate 1-axis
            self.mesh = make_mesh(ndev, axes=axes)
            self._shard_state = lambda s: shard_ns_state(s, self.grid,
                                                         self.mesh)
            if self.hierarchy is not None:
                # AMR: island the level advances where compatible (the
                # MPI-runs-everything analog); incompatible levels stay
                # GSPMD jnp, gated safe by parallel/pallas_gate.py
                self.hierarchy.attach_mesh(self.mesh)
            if use_island:
                from somar_tpu.parallel.sharded_step import ShardedNSStep
                try:
                    self._sharded = ShardedNSStep(self.level, self.mesh)
                except AssertionError as e:
                    # shard too thin / indivisible nx: stay on the GSPMD
                    # auto-partitioned jnp step (correct by the Pallas
                    # shard-locality gate, parallel/pallas_gate.py)
                    from somar_tpu.utils.printing import pout
                    pout(f"shard_map island unavailable ({e}); "
                         "using GSPMD jnp step")
                else:
                    self._step_fn = jax.jit(
                        lambda s, dt: self._sharded.advance(s, dt))
        self._interrupted = False
        # periodic in-run callbacks (reference: Chombo Scheduler hook,
        # LepticAMR.H:166, executed per coarse step LepticAMR.cpp:799-800)
        from somar_tpu.utils.scheduler import Scheduler
        self.scheduler = Scheduler()
        # per-process run log (reference: pout.<rank> parstream)
        from somar_tpu.utils.printing import set_pout_dir
        set_pout_dir(out_dir)

    def _shard_fine(self, fine_state):
        """Place AMR patch states on the device mesh (same horizontal
        layout as the base level: x/y sharded, vertical + patch axis
        replicated) — without this the patch levels' arrays, the bulk of
        the AMR work, stay wherever GSPMD's output shardings left them
        (typically replicated).  Reference analog: LoadBalance assigns
        FINE-level boxes to ranks too (AMRNavierStokesRegrid.cpp:40-56)."""
        if self.mesh is None or fine_state is None:
            return fine_state
        from somar_tpu.parallel.mesh import shard_ns_state
        single = not isinstance(fine_state, (list, tuple))
        fines = [fine_state] if single else list(fine_state)
        fines = [shard_ns_state(s, c.ext_grid, self.mesh)
                 for s, c in zip(fines, self.hierarchy.couplings)]
        return fines[0] if single else tuple(fines)

    # ---------------------------------------------------------------- run
    def run(self, max_steps: Optional[int] = None,
            final_time: Optional[float] = None, verbose: bool = True):
        import jax.numpy as jnp
        from somar_tpu.io.checkpoint import (
            read_checkpoint, write_checkpoint, write_chombo_plotfile)
        from somar_tpu.utils.debug import assert_finite_host
        from somar_tpu.utils.printing import pout
        from somar_tpu.utils.timers import timer

        ctx = self.ctx
        max_steps = ctx.amr.max_steps if max_steps is None else max_steps
        final_time = ctx.amr.final_time if final_time is None else final_time

        step0 = 0
        restored_fine = None
        if ctx.amr.restart_file:
            got = read_checkpoint(
                os.path.join(self.out_dir, ctx.amr.restart_file), self.level,
                fine_grid=([c.ext_grid for c in self.hierarchy.couplings]
                           if self.hierarchy is not None else None))
            if len(got) > 3:
                # exact AMR resume (reference: setupForRestart,
                # LepticAMR.cpp:512): restore every patch level + origins
                state, step0, dt_prev = got[0], got[1], got[2]
                fines, origs = got[3], got[4]
                wts = got[5] if len(got) > 5 else (None,) * len(fines)
                psels = got[6] if len(got) > 6 else (None,) * len(fines)
                for lev, c in enumerate(self.hierarchy.couplings):
                    c.origin_f = np.asarray(origs[lev])
                    c.weights = (None if wts[lev] is None
                                 else np.asarray(wts[lev]))
                    c.parent_sel = (None if psels[lev] is None
                                    else np.asarray(psels[lev]))
                    self.hierarchy._refresh_bundle(lev)
                restored_fine = (
                    tuple(fines),
                    tuple(jnp.asarray(o) for o in origs),
                    tuple(None if w is None
                          else jnp.asarray(w, ctx.ns.dtype) for w in wts))
            else:
                state, step0, dt_prev = got
            dt = jnp.asarray(dt_prev, ctx.ns.dtype)
        else:
            state = self.level.post_initialize(
                self.level.initial_state(),
                num_proj=max(1, ctx.amr.init_projection_iters))
            dt0 = float(self._dt_fn(state)) * ctx.ns.init_dt_multiplier
            dt0 = min(dt0, ctx.ns.max_dt)
            if ctx.ns.fixed_dt > 0:
                dt0 = ctx.ns.fixed_dt
            dt = jnp.asarray(dt0, ctx.ns.dtype)
            state = self.level.initialize_pressure(
                state, dt, iters=max(1, ctx.amr.init_pressure_iters))

        if self._shard_state is not None:
            # place the base state on the device mesh (multi-chip runs;
            # the reference analog is the LoadBalance box->rank map)
            state = self._shard_state(state)

        prev_handler = signal.signal(
            signal.SIGINT, lambda *_: setattr(self, "_interrupted", True))

        # AMR: build the patch levels (or restore them from the checkpoint)
        fine_state = origin = weights = None
        if self.hierarchy is not None:
            if restored_fine is not None:
                fine_state, origin, weights = restored_fine
                if not self.hierarchy.multi_patch:
                    weights = None
            else:
                got = self.hierarchy.initial_patch_states(state)
                if self.hierarchy.multi_patch:
                    fine_state, origin, weights = got
                else:
                    fine_state, origin = got
                # composite init projection over the fresh hierarchy
                # (reference: AMRCCProjector init-projection iterations,
                # AMRNavierStokesInit.cpp:376-388)
                import jax as _jax
                state, fine_state = _jax.jit(
                    self.hierarchy.init_project,
                    static_argnames=("iters",))(
                        state, fine_state, origin,
                        self.hierarchy.geo_bundles, weights,
                        self.hierarchy.parent_sels,
                        iters=max(1, ctx.amr.init_projection_iters))
                # hierarchy-wide initial pressure: dummy WHOLE-hierarchy
                # advances keeping only the pressures, so fine levels
                # start with a converged lagged pressure too (reference:
                # initializeGlobalPressure dummy advances + resetStates,
                # AMRNavierStokesInit.cpp:1093; the level-0-only pass
                # above runs before the patches exist)
                if ctx.amr.init_pressure_iters > 0:
                    state, fine_state = _jax.jit(
                        self.hierarchy.initialize_pressure,
                        static_argnames=("iters",))(
                            state, fine_state, origin, dt,
                            self.hierarchy.geo_bundles, weights,
                            self.hierarchy.parent_sels,
                            iters=max(1, ctx.amr.init_pressure_iters))
            fine_state = self._shard_fine(fine_state)
            # substeps of coupling k per coarse step = prod of nt's above it
            self._amr_substeps = []
            factor = 1
            for c in self.hierarchy.couplings:
                factor *= c.nt
                self._amr_substeps.append(factor)

        level_dts = None
        if self.hierarchy is not None:
            level_dts = self._amr_leveldt_fn(state, fine_state,
                                             self.hierarchy.geo_bundles)

        cell_updates = 0
        t_start = time.perf_counter()
        last_plot_time = float(state.time)
        step = step0
        try:
            # max_steps is the maximum step NUMBER, as in the reference
            # (LepticAMR::run loops while m_cur_step < a_max_step), so a
            # restarted run continues to the same absolute step count.
            while step < max_steps and float(state.time) < final_time:
                # graceful stop: `halt` file or SIGINT
                if self._interrupted or os.path.exists(
                        os.path.join(self.out_dir, "halt")):
                    if verbose:
                        print("halt requested — stopping cleanly")
                    break

                t0 = time.perf_counter()
                state_old, fine_old = state, fine_state
                with timer("advance"):
                    if self.hierarchy is not None:
                        # dynamic subcycling (reference: LepticAMR::
                        # timeStep's reduction factors, LepticAMR.cpp:
                        # 993-1047): double a level's substeps when the
                        # assigned dt overshoots its CFL dt by >10%
                        nt_mults = (1,) * len(self.hierarchy.couplings)
                        if ctx.ns.fixed_dt <= 0 and ctx.amr.use_subcycling \
                                and level_dts is not None:
                            nt_mults = self.hierarchy.subcycle_multipliers(
                                float(dt), [float(x) for x in level_dts])
                            if any(m > 1 for m in nt_mults) and verbose \
                                    and ctx.amr.verbosity >= 2:
                                print(f"  subcycling: factors {nt_mults}")
                        state, fine_state = self._amr_step_fn(
                            state, fine_state, origin, dt,
                            self.hierarchy.geo_bundles, weights,
                            nt_mults=nt_mults,
                            parent_sels=self.hierarchy.parent_sels)
                        factor = 1
                        for c, m in zip(self.hierarchy.couplings, nt_mults):
                            factor *= c.nt * m
                            cell_updates += factor * c.K * int(np.prod(c.ext_nx))
                    else:
                        state = self._step_fn(state, dt)
                    state.vel.block_until_ready()
                wc = time.perf_counter() - t0
                if ctx.amr.verbosity >= 3:
                    # host-side NaN net per step (reference: debug-build
                    # checkForValidNAN after each advance)
                    assert_finite_host(state.vel, f"step {step + 1} velocity")
                step += 1
                cell_updates += self.grid.ncells

                # regrid cadence (reference: LepticAMR::needToRegrid):
                # the shallowest level due this step sets lbase; couplings
                # below it keep their patches
                if self.hierarchy is not None:
                    due = [lev for lev, iv in enumerate(self.regrid_intervals)
                           if iv > 0 and step % iv == 0]
                    if due:
                        with timer("regrid"):
                            got = self.hierarchy.regrid(
                                state, fine_state, dt=float(dt),
                                from_level=min(due))
                        if self.hierarchy.multi_patch:
                            fine_state, origin, weights = got
                        else:
                            fine_state, origin = got
                        fine_state = self._shard_fine(fine_state)
                        # when runtime right-sizing changed the patch
                        # stack's SHAPES, the pre-step old-time snapshot
                        # lives on grids that no longer exist — re-point
                        # it at the regridded data (the reference's
                        # regrid moves old AND new data to the new
                        # grids, AMRNavierStokesRegrid.cpp:688); shape-
                        # preserving regrids keep the genuine old state
                        def _shapes(t):
                            import jax as _j
                            return [(a.shape if hasattr(a, "shape")
                                     else None)
                                    for a in _j.tree_util.tree_leaves(t)]
                        if _shapes(fine_old) != _shapes(fine_state):
                            fine_old = fine_state

                # next dt: CFL-limited, growth-capped (per-level dts
                # feed both the coarse dt and next step's dynamic-
                # subcycle check, LepticAMR::assignDt)
                if self.hierarchy is not None:
                    level_dts = self._amr_leveldt_fn(
                        state, fine_state, self.hierarchy.geo_bundles)
                    dt_new = level_dts[0]
                    f = 1
                    for c, d in zip(self.hierarchy.couplings,
                                    level_dts[1:]):
                        f *= c.nt
                        dt_new = jnp.minimum(dt_new, f * d)
                else:
                    dt_new = self._dt_fn(state)
                dt = jnp.minimum(dt_new, ctx.ns.max_dt_grow * dt)
                dt = jnp.minimum(dt, jnp.asarray(ctx.ns.max_dt))
                if ctx.ns.fixed_dt > 0:
                    dt = jnp.asarray(ctx.ns.fixed_dt, ctx.ns.dtype)

                # scheduler hook (reference: LepticAMR.cpp:799-800)
                self.scheduler.execute(step, float(state.time), state)

                line = (f"step {step:6d}  t = {float(state.time):.6g}  "
                        f"dt = {float(dt):.4g}  wall = {wc * 1e3:.1f} ms")
                if ctx.amr.verbosity >= 2:
                    # energy + divergence + lambda-drift diagnostics
                    # (reference: the postTimeStep sync diagnostics,
                    # AMRNavierStokesSync.cpp:1066-1246)
                    e = float(self.level.total_energy(state))
                    dmax = float(jnp.max(jnp.abs(
                        self.level.cell_divergence(state))))
                    ldrift = float(jnp.max(jnp.abs(state.lam - 1.0)))
                    line += (f"  E = {e:.8g}  max|div| = {dmax:.3e}  "
                             f"max|lambda-1| = {ldrift:.3e}")
                pout(line)
                if verbose and ctx.amr.verbosity > 0:
                    print(line)

                # plot cadence
                p = ctx.plot
                do_plot = (p.plot_interval > 0
                           and step % p.plot_interval == 0)
                if p.plot_period > 0 and \
                        float(state.time) - last_plot_time >= p.plot_period:
                    do_plot = True
                if do_plot:
                    last_plot_time = float(state.time)
                    with timer("write_plotfile"):
                        # Chombo-format HDF5 (VisIt / SOMAR-tooling
                        # readable), reference naming plot_NNNNNN.Dd.hdf5
                        # (LepticAMR::writePlotFile, LepticAMR.cpp:1660)
                        write_chombo_plotfile(
                            os.path.join(
                                self.out_dir,
                                f"{p.plot_prefix}{step:06d}."
                                f"{self.grid.ndim}d.hdf5"),
                            state, self.level, step, p,
                            hierarchy=self.hierarchy,
                            fine_states=fine_state, dt=float(dt))
                if p.checkpoint_interval > 0 and \
                        step % p.checkpoint_interval == 0:
                    with timer("write_checkpoint"):
                        write_checkpoint(
                            os.path.join(
                                self.out_dir,
                                f"{p.checkpoint_prefix}{step:06d}.hdf5"),
                            state, self.level, step, float(dt),
                            fine_state=fine_state,
                            fine_grid=([c.ext_grid for c in
                                        self.hierarchy.couplings]
                                       if self.hierarchy else None),
                            origin=(None if origin is None
                                    else [np.asarray(o) for o in origin]),
                            weights=(None if self.hierarchy is None else
                                     [None if c.weights is None
                                      else np.asarray(c.weights)
                                      for c in self.hierarchy.couplings]),
                            parent_sels=(
                                None if self.hierarchy is None else
                                [None if c.parent_sel is None
                                 else np.asarray(c.parent_sel)
                                 for c in self.hierarchy.couplings]),
                            old_state=state_old, old_fine=fine_old,
                            hierarchy=self.hierarchy,
                            cfl=ctx.ns.cfl)
        finally:
            signal.signal(signal.SIGINT, prev_handler)

        elapsed = time.perf_counter() - t_start
        # the reference's concluding report (LepticAMR::conclude) — always
        # logged to pout.<rank>, echoed to the terminal when verbose
        report = [f"total cell updates: {cell_updates}"]
        if elapsed > 0:
            report.append(f"cell updates/sec: {cell_updates / elapsed:.4g}")
        report.append(f"total elapsed: {elapsed:.2f} s")
        # peak-memory report (reference: get_memory_usage_from_OS +
        # memory tracking at exec/somar.cpp:204-215; this project's
        # recurring failure mode is VMEM/HBM ceilings, so make them
        # observable on every run)
        try:
            import resource
            rss_mb = resource.getrusage(
                resource.RUSAGE_SELF).ru_maxrss / 1024.0
            report.append(f"peak host RSS: {rss_mb:.0f} MB")
        except Exception:
            pass
        try:
            import jax
            stats = jax.devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use")
            lim = stats.get("bytes_limit")
            if peak is not None:
                line = f"peak device HBM: {peak / 2**20:.0f} MB"
                if lim:
                    line += f" of {lim / 2**20:.0f} MB"
                report.append(line)
        except Exception:
            pass
        # hierarchical timer report (CH_TIMER_REPORT analog,
        # exec/somar.cpp:222)
        report.append(timer.report())
        for line in report:
            pout(line)
        if verbose:
            for line in report[:-1]:
                print(line)
            if ctx.amr.verbosity >= 2:
                print(report[-1])
        # final checkpoint (LepticAMR::conclude, :671-679)
        from somar_tpu.io.checkpoint import write_checkpoint as _wc
        _wc(os.path.join(self.out_dir,
                         f"{ctx.plot.checkpoint_prefix}final.hdf5"),
            state, self.level, step, float(dt),
            fine_state=fine_state,
            fine_grid=([c.ext_grid for c in self.hierarchy.couplings]
                       if self.hierarchy else None),
            origin=None if origin is None else [np.asarray(o)
                                                for o in origin],
            weights=(None if self.hierarchy is None else
                     [None if c.weights is None else np.asarray(c.weights)
                      for c in self.hierarchy.couplings]),
            parent_sels=(None if self.hierarchy is None else
                         [None if c.parent_sel is None
                          else np.asarray(c.parent_sel)
                          for c in self.hierarchy.couplings]),
            old_state=locals().get("state_old"),
            old_fine=locals().get("fine_old"),
            hierarchy=self.hierarchy, cfl=ctx.ns.cfl)
        return state, step
