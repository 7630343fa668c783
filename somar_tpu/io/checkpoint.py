"""HDF5 checkpoint / restart + plotfiles.

Re-design of the reference's IO layer
(`/root/reference/src/NavierStokes/AMRNavierStokesIO.cpp`):
  * checkpoints (:44-165): header metadata (step, dt, time, cfl,
    prob_domain, periodicity, ref ratios) + per-level state (new/old vel,
    lambda, scalars, ccPressure, eLambda) with exact-resume semantics;
  * restart (:167+, LepticAMR::setupForRestart LepticAMR.cpp:512);
  * plotfiles (writePlotHeader/writePlotLevel, getPlotData :1203) with the
    optional derived fields gated by plot.write* flags.

Layout: one HDF5 file, group `level_<i>` per level; field names match the
reference's component naming so post-processing tooling carries over.

The reference also checkpoints the OLD-time state per level
(AMRNavierStokesIO.cpp:140) because its in-memory levels interpolate
fine-level ghosts in time between the coarse old/new pair mid-subcycle.
This rebuild's functional step re-derives the within-coarse-step time
interpolants from the coarse state at the step boundary (checkpoints are
only written there, LepticAMR.cpp:776-782), so a single state per level
gives exact resume — asserted by tests/test_driver_io.py's bitwise
resume tests.  The driver still passes the previous step's state so
old_* datasets are written for field-set parity with the reference's
files; resume ignores them.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

import numpy as np


def _write_level_group(f, name: str, state, grid, origin=None,
                       weights=None, parent_sel=None, old_state=None):
    g = f.create_group(name)
    g.attrs["nx"] = np.asarray(grid.nx)
    g.attrs["dx"] = np.asarray(grid.dx)
    g.attrs["x0"] = np.asarray(grid.x0)
    g.attrs["periodic"] = np.asarray(grid.periodic, dtype=np.int8)
    if origin is not None:
        g.attrs["patch_origin"] = np.asarray(origin)
    if weights is not None:
        g.attrs["patch_weights"] = np.asarray(weights)
    if parent_sel is not None:
        g.attrs["parent_sel"] = np.asarray(parent_sel)
    vel = np.asarray(state.vel)
    scal = np.asarray(state.scalars)
    multi = vel.ndim == grid.ndim + 2   # leading patch axis (multi-patch)
    if multi:
        g.attrs["num_patches"] = vel.shape[0]
    for m in range(grid.ndim):
        g.create_dataset(f"new_velocity_{m}",
                         data=vel[:, m] if multi else vel[m])
    for c in range(scal.shape[1] if multi else scal.shape[0]):
        g.create_dataset(f"new_scalar_{c}",
                         data=scal[:, c] if multi else scal[c])
    g.create_dataset("new_lambda", data=np.asarray(state.lam))
    if old_state is not None:
        # the reference's checkpoints store the OLD-time state alongside
        # the new (AMRNavierStokesIO.cpp:140).  Resume does not need it
        # here (see the module docstring) — written for field-set parity
        # with SOMAR post-processing tooling
        ovel = np.asarray(old_state.vel)
        oscal = np.asarray(old_state.scalars)
        for m in range(grid.ndim):
            g.create_dataset(f"old_velocity_{m}",
                             data=ovel[:, m] if multi else ovel[m])
        for c in range(oscal.shape[1] if multi else oscal.shape[0]):
            g.create_dataset(f"old_scalar_{c}",
                             data=oscal[:, c] if multi else oscal[c])
        g.create_dataset("old_lambda", data=np.asarray(old_state.lam))
    g.create_dataset("eLambda", data=np.asarray(state.e_lambda))
    g.create_dataset("ccPressure", data=np.asarray(state.cc_phi))
    g.create_dataset("pressure", data=np.asarray(state.pressure))
    g.create_dataset("macPressure", data=np.asarray(state.mac_phi))


def write_checkpoint(path: str, state, level, step: int, dt: float,
                     extra: Optional[dict] = None,
                     fine_state=None, fine_grid=None, origin=None,
                     weights=None, parent_sels=None, old_state=None,
                     old_fine=None, hierarchy=None, cfl: float = 0.0):
    """Save full state for exact resume.  With fine_state/fine_grid/origin
    the AMR patch levels are stacked as groups level_1..level_N
    (reference: per-level checkpoint groups, AMRNavierStokesIO.cpp:92-165).
    Each of fine_state/fine_grid/origin may be a single value (2-level
    runs) or a coarse-to-fine sequence (N-level hierarchies)."""
    import h5py

    if fine_state is not None and not isinstance(fine_state, (list, tuple)):
        fine_state = [fine_state]
        fine_grid = [fine_grid]
        origin = [origin]
        if old_fine is not None and not isinstance(old_fine, (list, tuple)):
            old_fine = [old_fine]
    if weights is None and fine_state is not None:
        weights = [None] * len(fine_state)
    if parent_sels is None and fine_state is not None:
        parent_sels = [None] * len(fine_state)
    grid = level.grid
    nfine = 0 if fine_state is None else len(fine_state)
    with h5py.File(path, "w") as f:
        f.attrs["iteration"] = step
        f.attrs["time"] = float(state.time)
        f.attrs["dt"] = float(dt)
        f.attrs["num_levels"] = 1 + nfine
        f.attrs["ndim"] = grid.ndim
        f.attrs["config_json"] = json.dumps(extra or {})
        _write_level_group(f, "level_0", state, grid,
                           old_state=old_state)
        for k in range(nfine):
            _write_level_group(f, f"level_{k + 1}", fine_state[k],
                               fine_grid[k], origin[k],
                               weights=weights[k],
                               parent_sel=parent_sels[k],
                               old_state=(old_fine[k]
                                          if old_fine is not None
                                          else None))
        _chombo_checkpoint_view(f, state, level, fine_state, hierarchy,
                                step, dt, cfl, old_state, old_fine)


def _chombo_checkpoint_view(f, state, level, fine_states, hierarchy,
                            step, dt, cfl, old_state, old_fine):
    """Chombo-layout view of the checkpoint, written INTO the same file
    alongside the native datasets, so reference/SOMAR tooling built on
    CH_HDF5 reads checkpoints exactly as it reads our plotfiles
    (reference layout: writeCheckpointHeader component metadata +
    writeCheckpointLevel per-level header attrs, boxes and the
    new/old velocity/lambda/scalar + ccPressure/eLambda LevelDatas,
    AMRNavierStokesIO.cpp:44-165).  Native dataset names
    (`new_velocity_0`) and Chombo dataset names
    (`new_velocity:datatype=0`) do not collide, so one file serves both
    readers; resume reads the native view."""
    grid = level.grid
    ndim = grid.ndim
    nscal = int(np.asarray(state.scalars).shape[-ndim - 1])

    # ---- root header (writeCheckpointHeader): field-name metadata
    f.attrs["num_components"] = np.int32(nscal)
    for c in range(nscal):
        f.attrs[f"component_{c}"] = np.bytes_(f"scalar_{c}")
    f.attrs["lambda_component"] = np.bytes_("lambda")
    for m in range(ndim):
        f.attrs[f"vel_component_{m}"] = np.bytes_(
            f"{'xyz'[m] if ndim == 3 or m < ndim - 1 else 'z'}_vel")
    f.attrs["ccPressure_component"] = np.bytes_("ccPressure")
    f.attrs["eLambda_component"] = np.bytes_("eLambda")
    if "Chombo_global" not in f:
        gg = f.create_group("Chombo_global")
        gg.attrs["SpaceDim"] = np.int32(ndim)
        gg.attrs["testReal"] = np.float64(0.0)

    fs = ([] if fine_states is None or hierarchy is None
          else list(fine_states))
    nlev = 1 + len(fs)
    domain_nx = np.asarray(grid.nx, np.int64)
    lev_dt = float(dt)
    for ilev in range(nlev):
        g = f[f"level_{ilev}"]
        if ilev == 0:
            st, old = state, old_state
            boxes = [(np.zeros(ndim, np.int64), domain_nx - 1,
                      (slice(None),) * ndim)]
            patch_ids = [None]
            dx = grid.dx
            rr = ([hierarchy.couplings[0].ratio[d] for d in range(ndim)]
                  if hierarchy is not None and hierarchy.couplings
                  else [1] * ndim)
            t = float(state.time)
        else:
            c = hierarchy.couplings[ilev - 1]
            st, old = fs[ilev - 1], (old_fine[ilev - 1]
                                     if old_fine is not None else None)
            domain_nx = domain_nx * np.asarray(
                [c.ratio[d] for d in range(ndim)], np.int64)
            boxes, patch_ids = _fine_level_boxes(hierarchy, ilev - 1, c,
                                                 domain_nx)
            if c.K == 1:
                patch_ids = [None]
            dx = c.ext_grid.dx
            rr = ([hierarchy.couplings[ilev].ratio[d] for d in range(ndim)]
                  if ilev < len(hierarchy.couplings) else [1] * ndim)
            lev_dt /= c.nt
            t = float(np.asarray(st.time).ravel()[0])

        # ---- level header attrs (writeCheckpointLevel)
        g.attrs["step_number"] = np.int32(step)
        g.attrs["ref_ratio"] = _as_iv(rr, ndim)
        g.attrs["vec_dx"] = _as_rv(dx, ndim)
        g.attrs["dt"] = np.float64(lev_dt)
        g.attrs["time"] = np.float64(t)
        g.attrs["cfl"] = np.float64(cfl)
        g.attrs["finest_level"] = np.int32(nlev - 1)
        g.attrs["is_empty"] = np.int32(0)
        g.attrs["prob_domain"] = _as_box(np.zeros(ndim, np.int64),
                                         domain_nx - 1, ndim)
        for d in range(ndim):
            g.attrs[f"is_periodic_{d}"] = np.int32(
                1 if grid.periodic[d] else 0)

        box_recs = np.empty(len(boxes), _box_dtype(ndim))
        for b, (lo, hi, _) in enumerate(boxes):
            box_recs[b] = _as_box(lo, hi, ndim)
        g.create_dataset("boxes", data=box_recs)
        g.create_dataset("Processors",
                         data=np.zeros(len(boxes), "<i4"))

        def comp(field, m, k):
            """Component m of a (maybe patch-stacked) field, box k."""
            a = np.asarray(field)
            if k is not None:                  # leading patch axis
                a = a[k]
            return (a[m] if m is not None else a)

        def boxed(field, ncomp):
            out = []
            for (lo, hi, sl), k in zip(boxes, patch_ids):
                ms = range(ncomp) if ncomp > 1 else [None]
                out.append([comp(field, m, k)[sl] for m in ms])
            return out

        _write_chombo_leveldata(g, "new_velocity", boxed(st.vel, ndim),
                                ndim, ndim)
        _write_chombo_leveldata(
            g, "old_velocity",
            boxed(old.vel if old is not None else st.vel, ndim),
            ndim, ndim)
        _write_chombo_leveldata(g, "new_lambda", boxed(st.lam, 1), ndim, 1)
        _write_chombo_leveldata(
            g, "old_lambda",
            boxed(old.lam if old is not None else st.lam, 1), ndim, 1)
        scal = np.asarray(st.scalars)
        oscal = np.asarray(old.scalars) if old is not None else scal
        multi = scal.ndim == ndim + 2
        for c_ in range(nscal):
            sel = ((slice(None), c_) if multi else (c_,))
            _write_chombo_leveldata(
                g, f"new_scalar_component_{c_}",
                boxed(scal[sel], 1), ndim, 1)
            _write_chombo_leveldata(
                g, f"old_scalar_component_{c_}",
                boxed(oscal[sel], 1), ndim, 1)
        _write_chombo_leveldata(g, "ccPressure", boxed(st.cc_phi, 1),
                                ndim, 1)
        _write_chombo_leveldata(g, "eLambda", boxed(st.e_lambda, 1),
                                ndim, 1)


def _read_level_group(g, grid, dtype, nscal, time):
    import jax.numpy as jnp
    from somar_tpu.physics.navier_stokes import NSState

    multi = "num_patches" in g.attrs
    stack_ax = 1 if multi else 0
    vel = jnp.stack([jnp.asarray(g[f"new_velocity_{m}"][...], dtype)
                     for m in range(grid.ndim)], axis=stack_ax)
    scal = jnp.stack([jnp.asarray(g[f"new_scalar_{c}"][...], dtype)
                      for c in range(nscal)], axis=stack_ax)
    e_lam = (jnp.asarray(g["eLambda"][...], dtype) if "eLambda" in g
             else jnp.zeros(grid.shape, dtype))
    t = (jnp.full((int(g.attrs["num_patches"]),), time, dtype) if multi
         else jnp.asarray(time, dtype))
    return NSState(
        vel=vel, scalars=scal,
        lam=jnp.asarray(g["new_lambda"][...], dtype),
        mac_phi=jnp.asarray(g["macPressure"][...], dtype),
        cc_phi=jnp.asarray(g["ccPressure"][...], dtype),
        pressure=jnp.asarray(g["pressure"][...], dtype),
        e_lambda=e_lam,
        time=t,
    )


def read_checkpoint(path: str, level, fine_grid=None):
    """Restore state from a checkpoint.  Returns (state, step, dt) or,
    when the file holds an AMR hierarchy and fine_grid is given,
    (state, step, dt, fine_state, origin)."""
    import h5py
    import jax.numpy as jnp
    from somar_tpu.physics.navier_stokes import NSState

    grid = level.grid
    dtype = level.params.dtype
    with h5py.File(path, "r") as f:
        step = int(f.attrs["iteration"])
        time = float(f.attrs["time"])
        dt = float(f.attrs["dt"])
        g = f["level_0"]
        assert tuple(g.attrs["nx"]) == grid.nx, (
            f"checkpoint grid {tuple(g.attrs['nx'])} != run grid {grid.nx}")
        nscal = level.problem.num_scalars
        state = _read_level_group(g, grid, dtype, nscal, time)
        if fine_grid is not None and "level_1" in f:
            single = not isinstance(fine_grid, (list, tuple))
            grids = [fine_grid] if single else list(fine_grid)
            fines, origins, weights, psels = [], [], [], []
            for k, gk in enumerate(grids):
                g1 = f[f"level_{k + 1}"]
                fines.append(_read_level_group(g1, gk, dtype, nscal, time))
                origins.append(np.asarray(g1.attrs["patch_origin"]))
                weights.append(np.asarray(g1.attrs["patch_weights"])
                               if "patch_weights" in g1.attrs else None)
                psels.append(np.asarray(g1.attrs["parent_sel"])
                             if "parent_sel" in g1.attrs else None)
            if single:
                return state, step, dt, fines[0], origins[0]
            return (state, step, dt, tuple(fines), tuple(origins),
                    tuple(weights), tuple(psels))
    return state, step, dt


def _plot_fields(state, level, plot_cfg=None):
    """Field-name -> array dict for one level's plot dump (the reference's
    getPlotData branches, AMRNavierStokesIO.cpp:1203-1500)."""
    from somar_tpu.ops.stencil import vorticity

    grid = level.grid
    geo = level.geo
    fields = {}
    for m in range(grid.ndim):
        fields[f"velocity_{'xyz'[m] if m < grid.ndim - 1 or grid.ndim == 3 else 'z'}"] = \
            np.asarray(state.vel[m])
    # with a background split the plotted scalar is the TOTAL buoyancy
    # bbar + b' (reference: getPlotData's scalars branch adds the
    # background unless write_scalarsMinusBackground); the deviation is
    # available as buoyancy_pert
    b = np.asarray(state.scalars[0])
    prob = getattr(level, "problem", None)
    if (prob is not None and getattr(prob, "use_background_scalar", False)
            and getattr(prob, "background", None) is not None):
        import jax.numpy as _jnp
        z = np.broadcast_to(geo.phys_coords_cc()[grid.ndim - 1],
                            grid.shape)
        b = b + np.asarray(prob.background.value(_jnp.asarray(z)))
    fields["buoyancy"] = b
    if plot_cfg is None or plot_cfg.write_pressure:
        fields["pressure"] = np.asarray(state.pressure)
    if plot_cfg is not None and plot_cfg.write_lambda:
        fields["lambda"] = np.asarray(state.lam)
    if plot_cfg is not None and plot_cfg.write_divergence:
        fields["divergence"] = np.asarray(level.cell_divergence(state))
    if plot_cfg is not None and plot_cfg.write_vorticity:
        w = vorticity(state.vel, geo,
                      [level.vel_bcs_trace[m] for m in range(grid.ndim)])
        if grid.ndim == 2:
            fields["vorticity"] = np.asarray(w)
        else:
            for m in range(3):
                fields[f"vorticity_{'xyz'[m]}"] = np.asarray(w[m])
    if plot_cfg is not None and plot_cfg.write_displacement \
            and not geo.is_uniform:
        disp = geo.displacement_cc()
        for m in range(grid.ndim):
            fields[f"displacement_{m}"] = disp[m]
    if plot_cfg is not None and plot_cfg.write_geometry and not geo.is_uniform:
        fields["J"] = np.asarray(geo.J * np.ones(grid.shape))
    if plot_cfg is not None and getattr(plot_cfg, "write_streamfunction",
                                        False) and grid.ndim == 2:
        from somar_tpu.physics.derived import compute_stream_function
        fields["streamfunction"] = np.asarray(
            compute_stream_function(level, state))
    if plot_cfg is not None and getattr(plot_cfg, "write_grad_e_lambda",
                                        False):
        from somar_tpu.ops.stencil import mac_gradient, fc_to_cc
        ge = mac_gradient(state.e_lambda, geo, level.projector.phi_bcs)
        for m in range(grid.ndim):
            fields[f"grad_eLambda_{'xyz'[m]}"] = np.asarray(
                fc_to_cc(ge[m], m, grid))
    if plot_cfg is not None and getattr(plot_cfg, "write_ri", False):
        from somar_tpu.physics.derived import compute_ri_number
        fields["Ri"] = np.asarray(compute_ri_number(level, state))
    if plot_cfg is not None and getattr(plot_cfg, "write_scalars_minus_background", False):
        fields["buoyancy_pert"] = np.asarray(state.scalars[0])
    if plot_cfg is not None and getattr(plot_cfg, "write_level_ids", False):
        # level id per cell (reference: writeLevelIDs); refined-level
        # groups carry their own id via the group name
        fields["levelIDs"] = np.zeros(grid.shape, np.float32)
    if plot_cfg is not None and getattr(plot_cfg, "write_proc_ids", False):
        # single-program SPMD: the "rank" of every cell is device 0 on the
        # host side (shard ownership is a compiler decision, not a data
        # layout; reference: writeProcIDs)
        fields["procIDs"] = np.zeros(grid.shape, np.float32)
    return fields


def write_plotfile(path: str, state, level, step: int, plot_cfg=None):
    """Simple visualization dump (one group per level, named datasets)
    with the reference's optional derived fields (getPlotData,
    AMRNavierStokesIO.cpp:1203-1500).  For tool-compatible output see
    write_chombo_plotfile."""
    import h5py

    grid = level.grid
    fields = _plot_fields(state, level, plot_cfg)

    with h5py.File(path, "w") as f:
        f.attrs["iteration"] = step
        f.attrs["time"] = float(state.time)
        f.attrs["ndim"] = grid.ndim
        g = f.create_group("level_0")
        g.attrs["nx"] = np.asarray(grid.nx)
        g.attrs["dx"] = np.asarray(grid.dx)
        g.attrs["x0"] = np.asarray(grid.x0)
        for name, data in fields.items():
            g.create_dataset(name, data=data)


# ---------------------------------------------------------------------------
# Chombo-format plotfiles (VisIt-readable; the reference's native layout)
# ---------------------------------------------------------------------------

def _iv_dtype(ndim):
    """Chombo HDF5 IntVect compound type (CH_HDF5: intvecti/j/k)."""
    names = ["intvecti", "intvectj", "intvectk"][:ndim]
    return np.dtype([(n, "<i4") for n in names])


def _rv_dtype(ndim):
    """Chombo HDF5 RealVect compound type (CH_HDF5: x/y/z)."""
    return np.dtype([(n, "<f8") for n in "xyz"[:ndim]])


def _box_dtype(ndim):
    """Chombo HDF5 Box compound type (lo_i..hi_k)."""
    names = (["lo_i", "lo_j", "lo_k"][:ndim]
             + ["hi_i", "hi_j", "hi_k"][:ndim])
    return np.dtype([(n, "<i4") for n in names])


def _as_iv(v, ndim):
    out = np.zeros((), _iv_dtype(ndim))
    for i, n in enumerate(out.dtype.names):
        out[n] = int(v[i])
    return out


def _as_rv(v, ndim):
    out = np.zeros((), _rv_dtype(ndim))
    for i, n in enumerate(out.dtype.names):
        out[n] = float(v[i])
    return out


def _as_box(lo, hi, ndim):
    out = np.zeros((), _box_dtype(ndim))
    for i in range(ndim):
        out[out.dtype.names[i]] = int(lo[i])
        out[out.dtype.names[ndim + i]] = int(hi[i])
    return out


def _fab_flat(arrays_by_dir_order):
    """Flatten one box's per-component arrays to the Chombo FArrayBox
    linear layout: components outermost, logical dir 0 (x) fastest.
    Input arrays use the somar array-axis order (dir ndim-1, ..., dir 0),
    which already puts x last, so C-order ravel matches Fortran-order
    FArrayBox data."""
    return np.concatenate(
        [np.ascontiguousarray(a, dtype=np.float64).ravel(order="C")
         for a in arrays_by_dir_order])


def _fine_level_boxes(hierarchy, lev, c, domain_nx):
    """Active-patch interior boxes of fine level `lev` in that level's
    0-based global index space: list of (lo_idx, hi_idx, interior
    slices-into-ext-array), shared by the Chombo plotfile and checkpoint
    writers."""
    ndim = c.ext_grid.ndim
    lo_list = []
    patch_ids = []
    if c.K > 1:
        w = c.weights
        for k in range(c.K):
            if w is not None and float(w[k]) == 0.0:
                continue
            lo_list.append(hierarchy._global_origin(
                lev, last_origin=c.origin_f[k], patch=k))
            patch_ids.append(k)
    else:
        lo_list.append(hierarchy._global_origin(lev))
        patch_ids.append(0)
    int_start_ax = tuple(
        c.halo if c.ext_grid.dir_of_axis(ax) in c.cf_dirs else 0
        for ax in range(ndim))
    boxes = []
    for g in lo_list:
        # ext-corner global -> interior box, per logical dir
        lo_d = np.zeros(ndim, np.int64)
        hi_d = np.zeros(ndim, np.int64)
        sl = []
        for ax in range(ndim):
            d = c.ext_grid.dir_of_axis(ax)
            lo_d[d] = g[ax] + int_start_ax[ax]
            hi_d[d] = lo_d[d] + c.interior_nx[d] - 1
            sl.append(slice(int_start_ax[ax],
                            int_start_ax[ax] + c.interior_nx[d]))
        boxes.append((lo_d, hi_d, tuple(sl)))
    return boxes, patch_ids


def _write_chombo_leveldata(g, name, per_box_comp_arrays, ndim, ncomp):
    """One Chombo LevelData<FArrayBox> in group g (the layout CH_HDF5's
    write() emits and read() consumes): `<name>:datatype=0` flat doubles,
    `<name>:offsets=0` per-box offsets, `<name>_attributes` metadata."""
    offsets = [0]
    flat = []
    for arrays in per_box_comp_arrays:
        fb = _fab_flat(arrays)
        flat.append(fb)
        offsets.append(offsets[-1] + fb.size)
    g.create_dataset(f"{name}:datatype=0",
                     data=(np.concatenate(flat) if flat
                           else np.zeros(0, np.float64)))
    g.create_dataset(f"{name}:offsets=0",
                     data=np.asarray(offsets, "<i8"))
    ga = g.create_group(f"{name}_attributes")
    ga.attrs["comps"] = np.int32(ncomp)
    ga.attrs["ghost"] = _as_iv([0] * ndim, ndim)
    ga.attrs["outputGhost"] = _as_iv([0] * ndim, ndim)
    ga.attrs["objectType"] = np.bytes_("FArrayBox")


def write_chombo_plotfile(path: str, state, level, step: int, plot_cfg=None,
                          hierarchy=None, fine_states=None, dt: float = 0.0):
    """Chombo-format HDF5 plotfile (the reference's writePlotFile layout:
    LepticAMR.cpp:1646 root header; AMRNavierStokes::writePlotHeader
    component names, AMRNavierStokesIO.cpp:688; writePlotLevel level
    groups with intvect ref_ratio + realvect vec_dx + boxes +
    data:datatype=0, :1035-1090), so VisIt and existing SOMAR
    post-processing tooling read the output unchanged.

    hierarchy/fine_states: include the refined patch levels (interiors
    only, one box per active patch)."""
    import h5py

    grid = level.grid
    ndim = grid.ndim

    # per-level (fields, boxes) where boxes is a list of
    # (lo_idx, hi_idx, slices) in that level's global index space
    fields0 = _plot_fields(state, level, plot_cfg)
    comp_names = list(fields0.keys())
    levels = [(fields0, [(np.zeros(ndim, np.int64),
                          np.asarray(grid.nx, np.int64) - 1,
                          (slice(None),) * ndim)],
               grid.dx, np.asarray(grid.nx, np.int64))]
    ratios = []
    if hierarchy is not None and fine_states is not None:
        fs = (fine_states if isinstance(fine_states, (list, tuple))
              else [fine_states])
        domain_nx = np.asarray(
            [grid.nx[d] for d in range(ndim)], np.int64)
        for lev, c in enumerate(hierarchy.couplings):
            ratios.append([c.ratio[d] for d in range(ndim)])
            domain_nx = domain_nx * np.asarray(
                [c.ratio[d] for d in range(ndim)], np.int64)
            boxes, patch_ids = _fine_level_boxes(hierarchy, lev, c,
                                                 domain_nx)
            # per-patch fields (multi-patch: fields per active patch)
            if c.K > 1:
                from jax import tree_util as tu
                pf = [_plot_fields(tu.tree_map(lambda a: a[k], fs[lev]),
                                   c.level, plot_cfg)
                      for k in patch_ids]
                levels.append((pf, boxes, c.ext_grid.dx, domain_nx.copy()))
            else:
                levels.append((_plot_fields(fs[lev], c.level, plot_cfg),
                               boxes, c.ext_grid.dx, domain_nx.copy()))

    with h5py.File(path, "w") as f:
        f.attrs["max_level"] = np.int32(len(levels) - 1)
        f.attrs["num_levels"] = np.int32(len(levels))
        f.attrs["iteration"] = np.int32(step)
        f.attrs["time"] = np.float64(float(state.time))
        f.attrs["num_components"] = np.int32(len(comp_names))
        for i, name in enumerate(comp_names):
            f.attrs[f"component_{i}"] = np.bytes_(name)
        gg = f.create_group("Chombo_global")
        gg.attrs["SpaceDim"] = np.int32(ndim)
        gg.attrs["testReal"] = np.float64(0.0)

        nt_factor = 1
        for ilev, (fields, boxes, dx, dom_nx) in enumerate(levels):
            g = f.create_group(f"level_{ilev}")
            rr = (ratios[ilev] if ilev < len(ratios)
                  else [1] * ndim)
            g.attrs["ref_ratio"] = _as_iv(rr, ndim)
            g.attrs["vec_dx"] = _as_rv(dx, ndim)
            # scalar dx for stock Chombo readers (first dir)
            g.attrs["dx"] = np.float64(dx[0])
            if ilev > 0 and hierarchy is not None:
                nt_factor *= hierarchy.couplings[ilev - 1].nt
            g.attrs["dt"] = np.float64(dt / nt_factor)
            g.attrs["time"] = np.float64(float(state.time))
            g.attrs["prob_domain"] = _as_box(
                np.zeros(ndim, np.int64), dom_nx - 1, ndim)

            box_recs = np.empty(len(boxes), _box_dtype(ndim))
            for b, (lo, hi, _) in enumerate(boxes):
                box_recs[b] = _as_box(lo, hi, ndim)
            g.create_dataset("boxes", data=box_recs)

            per_patch = fields if isinstance(fields, list) else [fields]
            flat = []
            for b, (_, _, sl) in enumerate(boxes):
                fb = per_patch[b if len(per_patch) > 1 else 0]
                shape = next(iter(fb.values())).shape
                arrays = []
                for name in comp_names:
                    a = fb.get(name)
                    a = (np.zeros(shape) if a is None else np.asarray(a))
                    arrays.append(a[sl] if ilev > 0 else a)
                flat.append(_fab_flat(arrays))
            data = np.concatenate(flat) if flat else np.zeros(0)
            ds = g.create_dataset("data:datatype=0", data=data)
            ga = g.create_group("data_attributes")
            ga.attrs["comps"] = np.int32(len(comp_names))
            ga.attrs["ghost"] = _as_iv([0] * ndim, ndim)
            ga.attrs["outputGhost"] = _as_iv([0] * ndim, ndim)
            ga.attrs["objectType"] = np.bytes_("FArrayBox")
