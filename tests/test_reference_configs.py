"""End-to-end: the reference's shipped input files run through somar.py's
driver unchanged (a few steps each; the full-physics parity anchors live
in the dedicated test modules)."""

import numpy as np
import pytest

from somar_tpu.config.context import ProblemContext
from somar_tpu.driver import RunDriver

REF = "/root/reference/exec"


def _run(path, overrides, tmp_path, steps):
    ctx = ProblemContext.from_file(path, overrides)
    driver = RunDriver(ctx, out_dir=str(tmp_path))
    state, nsteps = driver.run(max_steps=steps, verbose=False)
    assert nsteps == steps
    assert np.all(np.isfinite(np.asarray(state.vel)))
    assert np.all(np.isfinite(np.asarray(state.scalars)))
    return state


def test_advection_test_config(tmp_path):
    # pure advection, projection off (projection.isIncompressible = 0)
    state = _run(f"{REF}/inputs.AdvectionTest.machine",
                 ["amr.maxsteps=3", "plot.plot_interval=-1",
                  "plot.checkpoint_interval=-1", "amr.verbosity=0",
                  "amr.nx=32 32"], tmp_path, 3)
    b = np.asarray(state.scalars[0])
    # slotted disk: the 1D reconstructions are limited but the unsplit
    # transverse corrections admit the classic ~10% over/undershoot at the
    # slot's corners (present in the reference's CTU too); bounded, stable
    assert b.min() > -0.15 and b.max() < 1.15


def test_taylor_green_config(tmp_path):
    _run(f"{REF}/inputs.TaylorGreen.machine",
         ["amr.maxsteps=3", "plot.plot_interval=-1",
          "plot.checkpoint_interval=-1", "amr.verbosity=0",
          "amr.nx=32 32", "AMRMG.eps=1e-6"], tmp_path, 3)


def test_lock_exchange_2d_amr_config(tmp_path):
    # the 2-level anisotropic AMR config (refratio 4 1), shrunk
    state = _run(f"{REF}/inputs.LockExchange_Cartesian2D.machine",
                 ["amr.maxsteps=3", "plot.plot_interval=-1",
                  "plot.checkpoint_interval=-1", "amr.verbosity=0",
                  "amr.nx=48 16", "amr.nx_offset=-24 0",
                  "amr.regrid_intervals=2 2", "AMRMG.eps=1e-5",
                  "amr.fixed_dt=0.02"], tmp_path, 3)
    b = np.asarray(state.scalars[0])
    assert b.min() > -0.05 and b.max() < 1.05


def test_lock_exchange_3d_config(tmp_path):
    # the 3D Cartesian config, shrunk to a tiny single-level grid
    state = _run(f"{REF}/inputs.LockExchange_Cartesian3D.machine",
                 ["amr.maxsteps=2", "plot.plot_interval=-1",
                  "plot.checkpoint_interval=-1", "amr.verbosity=0",
                  "amr.nx=16 8 8", "amr.nx_offset=-8 0 0",
                  "amr.maxlevel=0", "AMRMG.eps=1e-5",
                  "amr.fixed_dt=0.02"], tmp_path, 2)
    b = np.asarray(state.scalars[0])
    assert b.min() > -0.05 and b.max() < 1.05


def test_lock_exchange_ledge2d_config(tmp_path):
    # shelf-break (LedgeMap) bathymetry: mapped-geometry solve path
    state = _run(f"{REF}/inputs.LockExchange_Ledge2D.machine",
                 ["amr.maxsteps=2", "plot.plot_interval=-1",
                  "plot.checkpoint_interval=-1", "amr.verbosity=0",
                  "amr.nx=32 16", "amr.nx_offset=-30 0",
                  "amr.maxlevel=0", "AMRMG.eps=1e-4",
                  "amr.fixed_dt=0.01"], tmp_path, 2)
    b = np.asarray(state.scalars[0])
    assert b.min() > -0.05 and b.max() < 1.05


def test_lock_exchange_dem2d_config(tmp_path):
    # real-bathymetry DEM map (reads the reference's shipped HDF5 data)
    import os
    if not os.path.exists(
            "/root/reference/src/geometry/maps/DEMMaps/DEM_test_2d.hdf5"):
        pytest.skip("reference DEM data not present")
    state = _run(f"{REF}/inputs.LockExchange_DEM_2D.machine",
                 ["amr.maxsteps=2", "plot.plot_interval=-1",
                  "plot.checkpoint_interval=-1", "amr.verbosity=0",
                  "amr.nx=32 16", "amr.nx_offset=-16 0",
                  "amr.maxlevel=0", "AMRMG.eps=1e-4",
                  "amr.fixed_dt=0.005"], tmp_path, 2)
    b = np.asarray(state.scalars[0])
    assert np.isfinite(b).all()


def test_beam_generation_config(tmp_path):
    # internal-tide beam generation over the critical-slope ridge
    # (BeamGenerator map): terrain-following metric + background
    # stratification + tides.  Also guards the alpha DEGREES->radians
    # conversion (reference: ProblemContext.cpp:641) — with raw degrees
    # the ridge inverts the grid (J < 0 over most of the domain)
    import jax.numpy as jnp
    from somar_tpu.geometry.level_geometry import build_level_geometry
    ctx = ProblemContext.from_file(
        f"{REF}/inputs.BeamGeneration.machine",
        ["amr.nx=40 16", "amr.nx_offset=-20 0", "amr.maxlevel=0",
         "amr.verbosity=0"])
    geo = build_level_geometry(ctx.base_grid(), ctx.new_geo_source())
    J = np.asarray(geo.J * jnp.ones(ctx.base_grid().shape))
    assert J.min() > 0.0, J.min()

    state = _run(f"{REF}/inputs.BeamGeneration.machine",
                 ["amr.maxsteps=2", "plot.plot_interval=-1",
                  "plot.checkpoint_interval=-1", "amr.verbosity=0",
                  "amr.nx=40 16", "amr.nx_offset=-20 0",
                  "amr.maxlevel=0", "AMRMG.eps=1e-4",
                  "amr.fixed_dt=5.0"], tmp_path, 2)
    b = np.asarray(state.scalars[0])
    assert np.isfinite(b).all()


def test_lock_exchange_dem3d_config(tmp_path):
    # 3D real-bathymetry DEM map (transposed 3D depth data)
    import os
    if not os.path.exists(
            "/root/reference/src/geometry/maps/DEMMaps/DEM_test_3d.hdf5"):
        pytest.skip("reference DEM data not present")
    state = _run(f"{REF}/inputs.LockExchange_DEM_3D.machine",
                 ["amr.maxsteps=2", "plot.plot_interval=-1",
                  "plot.checkpoint_interval=-1", "amr.verbosity=0",
                  "amr.nx=16 24 8", "amr.nx_offset=-4 0 0",
                  "amr.maxlevel=0", "AMRMG.eps=1e-4",
                  "amr.fixed_dt=0.005"], tmp_path, 2)
    b = np.asarray(state.scalars[0])
    assert np.isfinite(b).all()


def test_all_shipped_configs_have_valid_metric():
    """Blanket guard: every shipped input file's geometry has a strictly
    positive Jacobian at a reduced resolution (a wrong map translation —
    like the BeamGenerator degrees/radians bug — inverts cells)."""
    import os
    import jax.numpy as jnp
    from somar_tpu.geometry.level_geometry import build_level_geometry
    for name in sorted(os.listdir(REF)):
        if not name.startswith("inputs.") or name.endswith("template.machine"):
            continue
        ctx = ProblemContext.from_file(f"{REF}/{name}", ["amr.verbosity=0"])
        nd = ctx.amr.ndim
        nx = {2: "32 16", 3: "16 16 8"}[nd]
        off = {2: "-16 0", 3: "-8 0 0"}[nd]
        ctx = ProblemContext.from_file(
            f"{REF}/{name}",
            ["amr.verbosity=0", f"amr.nx={nx}", f"amr.nx_offset={off}",
             "amr.maxlevel=0"])
        grid = ctx.base_grid()
        geo = build_level_geometry(grid, ctx.new_geo_source())
        J = np.asarray(geo.J * jnp.ones(grid.shape))
        assert np.isfinite(J).all() and J.min() > 0.0, (name, J.min())
