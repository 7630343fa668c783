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
resume tests — and old_* datasets are intentionally not stored.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

import numpy as np


def _write_level_group(f, name: str, state, grid, origin=None,
                       weights=None):
    g = f.create_group(name)
    g.attrs["nx"] = np.asarray(grid.nx)
    g.attrs["dx"] = np.asarray(grid.dx)
    g.attrs["x0"] = np.asarray(grid.x0)
    g.attrs["periodic"] = np.asarray(grid.periodic, dtype=np.int8)
    if origin is not None:
        g.attrs["patch_origin"] = np.asarray(origin)
    if weights is not None:
        g.attrs["patch_weights"] = np.asarray(weights)
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
    g.create_dataset("eLambda", data=np.asarray(state.e_lambda))
    g.create_dataset("ccPressure", data=np.asarray(state.cc_phi))
    g.create_dataset("pressure", data=np.asarray(state.pressure))
    g.create_dataset("macPressure", data=np.asarray(state.mac_phi))


def write_checkpoint(path: str, state, level, step: int, dt: float,
                     extra: Optional[dict] = None,
                     fine_state=None, fine_grid=None, origin=None,
                     weights=None):
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
    if weights is None and fine_state is not None:
        weights = [None] * len(fine_state)
    grid = level.grid
    nfine = 0 if fine_state is None else len(fine_state)
    with h5py.File(path, "w") as f:
        f.attrs["iteration"] = step
        f.attrs["time"] = float(state.time)
        f.attrs["dt"] = float(dt)
        f.attrs["num_levels"] = 1 + nfine
        f.attrs["ndim"] = grid.ndim
        f.attrs["config_json"] = json.dumps(extra or {})
        _write_level_group(f, "level_0", state, grid)
        for k in range(nfine):
            _write_level_group(f, f"level_{k + 1}", fine_state[k],
                               fine_grid[k], origin[k],
                               weights=weights[k])


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
            fines, origins, weights = [], [], []
            for k, gk in enumerate(grids):
                g1 = f[f"level_{k + 1}"]
                fines.append(_read_level_group(g1, gk, dtype, nscal, time))
                origins.append(np.asarray(g1.attrs["patch_origin"]))
                weights.append(np.asarray(g1.attrs["patch_weights"])
                               if "patch_weights" in g1.attrs else None)
            if single:
                return state, step, dt, fines[0], origins[0]
            return (state, step, dt, tuple(fines), tuple(origins),
                    tuple(weights))
    return state, step, dt


def write_plotfile(path: str, state, level, step: int, plot_cfg=None):
    """Visualization dump with the reference's optional derived fields
    (getPlotData, AMRNavierStokesIO.cpp:1203-1500)."""
    import h5py
    from somar_tpu.ops.stencil import vorticity

    grid = level.grid
    geo = level.geo
    fields = {}
    for m in range(grid.ndim):
        fields[f"velocity_{'xyz'[m] if m < grid.ndim - 1 or grid.ndim == 3 else 'z'}"] = \
            np.asarray(state.vel[m])
    fields["buoyancy"] = np.asarray(state.scalars[0])
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
