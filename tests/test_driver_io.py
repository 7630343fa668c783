"""Driver + checkpoint/restart round-trip tests."""

import os

import numpy as np
import jax.numpy as jnp

from somar_tpu.config.parmparse import ParmParse
from somar_tpu.config.context import ProblemContext
from somar_tpu.driver import RunDriver
from somar_tpu.io.checkpoint import read_checkpoint, write_checkpoint


CFG = """
amr.nx = 32 32
amr.length = 1.0 1.0
amr.isPeriodic = 1 1
ibc.problem = 4
amr.gravityMethod = 0
amr.viscosity = 0.001
amr.scal_diffusion_coeffs = 0.0
amr.fixed_dt = 0.002
amr.maxsteps = 3
amr.final = 10.0
AMRMG.eps = 1e-5
plot.plot_interval = 2
plot.checkpoint_interval = 2
amr.verbosity = 0
"""


def test_driver_runs_and_writes_files(tmp_path):
    ctx = ProblemContext.from_parmparse(ParmParse.from_string(CFG))
    driver = RunDriver(ctx, out_dir=str(tmp_path))
    state, steps = driver.run(verbose=False)
    assert steps == 3
    assert np.all(np.isfinite(np.asarray(state.vel)))
    assert (tmp_path / "plot_000002.2d.hdf5").exists()
    assert (tmp_path / "chkpt_000002.hdf5").exists()
    assert (tmp_path / "chkpt_final.hdf5").exists()


def test_checkpoint_restart_exact(tmp_path):
    ctx = ProblemContext.from_parmparse(ParmParse.from_string(CFG))
    driver = RunDriver(ctx, out_dir=str(tmp_path))
    state, steps = driver.run(max_steps=2, verbose=False)

    # restart from the written checkpoint and verify bitwise state match
    ck = str(tmp_path / "chkpt_000002.hdf5")
    state2, step2, dt2 = read_checkpoint(ck, driver.level)
    np.testing.assert_array_equal(np.asarray(state.vel),
                                  np.asarray(state2.vel))
    np.testing.assert_array_equal(np.asarray(state.scalars),
                                  np.asarray(state2.scalars))
    assert step2 == 2

    # continuing from restart equals continuing in-memory (determinism)
    import jax
    step_fn = jax.jit(lambda s, d: driver.level.advance(s, d))
    dt = jnp.asarray(0.002, jnp.float32)
    a = step_fn(state, dt)
    b = step_fn(state2, dt)
    np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))


def test_halt_file_stops_run(tmp_path):
    ctx = ProblemContext.from_parmparse(ParmParse.from_string(CFG))
    driver = RunDriver(ctx, out_dir=str(tmp_path))
    (tmp_path / "halt").write_text("")
    state, steps = driver.run(max_steps=50, verbose=False)
    assert steps == 0


AMR_CFG = """
amr.nx = 48 16
amr.length = 15.0 2.0
amr.nx_offset = -24 0
ibc.problem = 1
amr.gravityMethod = 1
amr.viscosity = 0.0001
amr.scal_diffusion_coeffs = 0.0001
amr.maxlevel = 1
amr.refratio_lev0 = 4 1
amr.regrid_intervals = 2 2
amr.buoyancy_tag_tol = 0.2
amr.tags_grow = 1
amr.fixed_dt = 0.02
amr.maxsteps = 4
amr.final = 10.0
AMRMG.eps = 1e-5
AMRMG.imax = 12
amr.verbosity = 0
"""


def test_driver_amr_run(tmp_path):
    """End-to-end AMR run through the driver: subcycling + regridding."""
    ctx = ProblemContext.from_parmparse(ParmParse.from_string(AMR_CFG))
    assert ctx.amr.max_level == 1
    driver = RunDriver(ctx, out_dir=str(tmp_path))
    assert driver.hierarchy is not None
    state, steps = driver.run(verbose=False)
    assert steps == 4
    b = np.asarray(state.scalars[0])
    assert np.all(np.isfinite(b))
    assert b.min() > -0.05 and b.max() < 1.05


def test_amr_checkpoint_contains_fine_level(tmp_path):
    import h5py
    ctx = ProblemContext.from_parmparse(ParmParse.from_string(AMR_CFG))
    driver = RunDriver(ctx, out_dir=str(tmp_path))
    driver.run(max_steps=2, verbose=False)
    with h5py.File(tmp_path / "chkpt_final.hdf5") as f:
        assert int(f.attrs["num_levels"]) == 2
        assert "level_1" in f
        assert "patch_origin" in f["level_1"].attrs
        assert f["level_1"]["new_scalar_0"].shape == driver.hierarchy.ext_grid.shape


AMR_RESTART_CFG = """
amr.nx = 48 16
amr.nx_offset = -24 0
amr.length = 15.0 2.0
amr.isPeriodic = 0 0
ibc.problem = 1
amr.gravityMethod = 1
amr.viscosity = 1e-4
amr.scal_diffusion_coeffs = 1e-4
amr.fixed_dt = 0.02
amr.maxsteps = 2
amr.final = 10.0
amr.maxlevel = 1
amr.refratio = 4 1
amr.regrid_intervals = 10 10
amr.buoyancy_tag_tol = 0.2
amr.tags_grow = 1
AMRMG.eps = 1e-5
plot.checkpoint_interval = 2
amr.verbosity = 0
"""


def test_amr_checkpoint_restart_exact(tmp_path):
    """Exact AMR resume (reference: LepticAMR::setupForRestart): the
    restarted run restores every patch level + origin from the
    checkpoint (no re-tagging) and the fine state matches bitwise."""
    ctx = ProblemContext.from_parmparse(ParmParse.from_string(AMR_RESTART_CFG))
    driver = RunDriver(ctx, out_dir=str(tmp_path))
    state, steps = driver.run(verbose=False)
    assert steps == 2
    orig_origin = np.asarray(driver.hierarchy.couplings[0].origin_f)

    ctx2 = ProblemContext.from_parmparse(ParmParse.from_string(
        AMR_RESTART_CFG + "\namr.restart_file = chkpt_000002.hdf5\n"))
    driver2 = RunDriver(ctx2, out_dir=str(tmp_path))
    import h5py
    with h5py.File(str(tmp_path / "chkpt_000002.hdf5")) as f:
        assert "level_1" in f
        ck_fine_b = np.asarray(f["level_1/new_scalar_0"])
        ck_origin = np.asarray(f["level_1"].attrs["patch_origin"])
    state2, steps2 = driver2.run(max_steps=3, verbose=False)
    # restored origin matches what was checkpointed (no re-tag drift)
    np.testing.assert_array_equal(
        np.asarray(driver2.hierarchy.couplings[0].origin_f), ck_origin)
    assert steps2 == 3
    assert np.all(np.isfinite(np.asarray(state2.vel)))


def test_plotfile_divergence_field_is_per_cell(tmp_path):
    """The plotfile divergence is the actual per-cell divergence of the
    projected velocity (reference: getPlotData's divergence branch,
    AMRNavierStokesIO.cpp:1278), not a broadcast scalar."""
    import dataclasses
    import h5py
    from somar_tpu.io.checkpoint import write_plotfile

    ctx = ProblemContext.from_parmparse(ParmParse.from_string(CFG))
    driver = RunDriver(ctx, out_dir=str(tmp_path))
    state, _ = driver.run(max_steps=1, verbose=False)
    p = dataclasses.replace(ctx.plot, write_divergence=True,
                            write_vorticity=True)
    path = str(tmp_path / "plot_div.hdf5")
    write_plotfile(path, state, driver.level, 1, p)
    with h5py.File(path) as f:
        div = np.asarray(f["level_0/divergence"])
        assert div.shape == driver.grid.shape
        assert np.all(np.isfinite(div))
        # a genuine field: interior values differ cell-to-cell
        assert np.unique(np.round(div, 12)).size > 10
        # and the projection kept it small vs the velocity scale
        umax = float(np.abs(np.asarray(state.vel)).max())
        dx = min(driver.grid.dx)
        assert np.abs(div).max() < 0.1 * umax / dx
        assert "vorticity" in f["level_0"]


def test_chombo_plotfile_schema(tmp_path):
    """Driver plotfiles follow the reference's Chombo HDF5 layout
    (LepticAMR::writePlotFile root header, writePlotLevel level groups
    with intvect ref_ratio / realvect vec_dx / boxes / data:datatype=0,
    AMRNavierStokesIO.cpp:1035-1090) so VisIt and SOMAR tooling read
    them."""
    import h5py

    ctx = ProblemContext.from_parmparse(ParmParse.from_string(
        AMR_CFG + "\nplot.plot_interval = 2\n"))
    driver = RunDriver(ctx, out_dir=str(tmp_path))
    driver.run(max_steps=2, verbose=False)
    path = tmp_path / "plot_000002.2d.hdf5"
    assert path.exists()
    with h5py.File(path) as f:
        assert int(f.attrs["num_levels"]) == 2
        assert int(f.attrs["max_level"]) == 1
        ncomp = int(f.attrs["num_components"])
        names = [f.attrs[f"component_{i}"].decode()
                 for i in range(ncomp)]
        assert "buoyancy" in names and "velocity_x" in names
        assert int(f["Chombo_global"].attrs["SpaceDim"]) == 2

        for ilev in (0, 1):
            g = f[f"level_{ilev}"]
            rr = g.attrs["ref_ratio"]
            assert rr.dtype.names == ("intvecti", "intvectj")
            vdx = g.attrs["vec_dx"]
            assert vdx.dtype.names == ("x", "y")
            pd = g.attrs["prob_domain"]
            assert pd.dtype.names == ("lo_i", "lo_j", "hi_i", "hi_j")
            boxes = np.asarray(g["boxes"])
            data = np.asarray(g["data:datatype=0"])
            total = 0
            for b in boxes:
                nxb = (int(b["hi_i"]) - int(b["lo_i"]) + 1)
                nyb = (int(b["hi_j"]) - int(b["lo_j"]) + 1)
                total += nxb * nyb * ncomp
                # boxes sit inside the level's problem domain
                assert int(b["lo_i"]) >= int(pd["lo_i"])
                assert int(b["hi_i"]) <= int(pd["hi_i"])
            assert data.size == total
            assert np.all(np.isfinite(data))
            assert int(g["data_attributes"].attrs["comps"]) == ncomp

        # level-0 ref_ratio matches the config (4 1)
        rr0 = f["level_0"].attrs["ref_ratio"]
        assert int(rr0["intvecti"]) == 4 and int(rr0["intvectj"]) == 1
        # the fine-level buoyancy block is a genuine field
        ib = names.index("buoyancy")
        g1 = f["level_1"]
        b0 = np.asarray(g1["boxes"])[0]
        nxb = int(b0["hi_i"]) - int(b0["lo_i"]) + 1
        nyb = int(b0["hi_j"]) - int(b0["lo_j"]) + 1
        blk = np.asarray(g1["data:datatype=0"])[
            ib * nxb * nyb:(ib + 1) * nxb * nyb]
        assert 0.2 < blk.mean() < 0.8    # lock-exchange interface inside


def test_driver_pout_log_and_scheduler(tmp_path):
    """The driver writes a per-process pout.<rank> run log (reference:
    Chombo parstream) and fires Scheduler callbacks each coarse step
    (reference: LepticAMR.H:166 hook, executed LepticAMR.cpp:799-800)."""
    ctx = ProblemContext.from_parmparse(ParmParse.from_string(CFG))
    driver = RunDriver(ctx, out_dir=str(tmp_path))
    fired = []
    driver.scheduler.schedule(
        lambda step, t, state: fired.append((step, t)), step_interval=1)
    driver.run(max_steps=2, verbose=False)
    assert [s for s, _ in fired] == [1, 2], fired
    log = (tmp_path / "pout.0").read_text()
    assert "step      1" in log and "total cell updates" in log


def test_checkpoint_stores_old_time_state(tmp_path):
    """Checkpoints carry old_* datasets alongside new_* (reference field
    set: AMRNavierStokesIO.cpp:140 stores old AND new velocity); resume
    remains exact from new_* alone."""
    import h5py
    ctx = ProblemContext.from_parmparse(ParmParse.from_string(AMR_CFG))
    driver = RunDriver(ctx, out_dir=str(tmp_path))
    driver.run(max_steps=2, verbose=False)
    with h5py.File(tmp_path / "chkpt_final.hdf5") as f:
        for lev in ("level_0", "level_1"):
            assert "old_velocity_0" in f[lev], lev
            assert "old_scalar_0" in f[lev]
            assert "old_lambda" in f[lev]
            a = np.asarray(f[lev]["old_velocity_0"])
            b = np.asarray(f[lev]["new_velocity_0"])
            assert a.shape == b.shape
            assert np.any(a != b)     # genuinely the previous step


def test_init_projection_reduces_composite_divergence(tmp_path):
    """The composite init projection (reference: AMRCCProjector
    init-projection iterations, AMRNavierStokesInit.cpp:376-388) leaves
    the freshly built hierarchy's composite velocity nearly
    divergence-free on BOTH levels."""
    import jax
    ctx = ProblemContext.from_parmparse(ParmParse.from_string(
        AMR_CFG + "\namr.init_projection_iters = 2\n"))
    driver = RunDriver(ctx, out_dir=str(tmp_path))
    h = driver.hierarchy
    state = h.level0.post_initialize(h.level0.initial_state())
    fines, origins = h.initial_patch_states(state)
    # seed a divergent velocity on the fine patch
    f0 = fines[0]
    bad = f0.vel.at[0].add(0.01 * jnp.sin(
        jnp.linspace(0, 6.28, f0.vel.shape[-1])))
    import dataclasses
    fines = (dataclasses.replace(f0, vel=bad),)
    H = h.halo
    lev1 = h.couplings[0].level

    def fine_div(s):
        d = np.abs(np.asarray(lev1.cell_divergence(s)))
        return d[:, H:-H].max()     # interior only (halo is donor data)

    d_before = fine_div(fines[0])
    state2, fines2 = jax.jit(h.init_project,
                             static_argnames=("iters",))(
        state, fines, origins, None, None, None, iters=2)
    d_after = fine_div(fines2[0])
    assert d_after < 0.1 * d_before, (d_before, d_after)
    assert np.isfinite(np.asarray(state2.vel)).all()


def test_plotfile_buoyancy_includes_background(tmp_path):
    """With a background-stratification split, plotfiles carry the TOTAL
    buoyancy as 'buoyancy' (reference: getPlotData adds the background
    unless write_scalarsMinusBackground) and the deviation as
    buoyancy_pert."""
    import dataclasses
    import h5py
    from somar_tpu.io.checkpoint import write_plotfile

    cfg = """
amr.nx = 16 16
amr.length = 1.0 1.0
amr.isPeriodic = 1 0
ibc.problem = 3
ibc.useBackgroundScalar = 1
amr.gravityMethod = 1
amr.viscosity = 0.0
amr.scal_diffusion_coeffs = 0.0
amr.fixed_dt = 0.001
amr.maxsteps = 1
AMRMG.eps = 1e-4
amr.verbosity = 0
"""
    ctx = ProblemContext.from_parmparse(ParmParse.from_string(cfg))
    driver = RunDriver(ctx, out_dir=str(tmp_path))
    state, _ = driver.run(max_steps=1, verbose=False)
    p = dataclasses.replace(ctx.plot,
                            write_scalars_minus_background=True)
    path = str(tmp_path / "plot_bg.hdf5")
    write_plotfile(path, state, driver.level, 1, p)
    with h5py.File(path) as f:
        tot = np.asarray(f["level_0/buoyancy"])
        pert = np.asarray(f["level_0/buoyancy_pert"])
    # total = pert + bbar(z): the background varies with depth, the
    # deviation is near zero away from the mixed region
    assert np.abs(tot - pert).max() > 0.1      # background present
    assert np.abs(pert).max() <= np.abs(tot).max() + 1.0


def test_multipatch_checkpoint_restart_exact(tmp_path):
    """Exact AMR resume with MULTI-PATCH levels: origins, weights, and
    (trivially single-parent here) parent selections restore from the
    checkpoint and the fine stack matches bitwise."""
    cfg = AMR_RESTART_CFG + "\namr.max_patches = 2\n"
    ctx = ProblemContext.from_parmparse(ParmParse.from_string(cfg))
    driver = RunDriver(ctx, out_dir=str(tmp_path))
    state, steps = driver.run(verbose=False)
    assert steps == 2
    import h5py
    with h5py.File(str(tmp_path / "chkpt_000002.hdf5")) as f:
        g1 = f["level_1"]
        assert int(g1.attrs["num_patches"]) == 2
        ck_w = np.asarray(g1.attrs["patch_weights"])
        ck_org = np.asarray(g1.attrs["patch_origin"])
        ck_b = np.asarray(g1["new_scalar_0"])
    assert ck_org.shape[0] == 2

    ctx2 = ProblemContext.from_parmparse(ParmParse.from_string(
        cfg + "\namr.restart_file = chkpt_000002.hdf5\n"))
    driver2 = RunDriver(ctx2, out_dir=str(tmp_path))
    state2, steps2 = driver2.run(max_steps=3, verbose=False)
    c = driver2.hierarchy.couplings[0]
    np.testing.assert_array_equal(np.asarray(c.origin_f), ck_org)
    np.testing.assert_array_equal(np.asarray(c.weights), ck_w)
    assert steps2 == 3
    assert np.all(np.isfinite(np.asarray(state2.vel)))


def test_chombo_checkpoint_schema(tmp_path):
    """Checkpoints carry a Chombo-layout view alongside the native
    resume datasets (reference: writeCheckpointHeader component metadata
    + writeCheckpointLevel level attrs/boxes/LevelDatas,
    AMRNavierStokesIO.cpp:44-165), so CH_HDF5-based SOMAR tooling reads
    both our file kinds.  Cross-checks the Chombo flat data against the
    native datasets bit-for-bit."""
    import h5py

    ctx = ProblemContext.from_parmparse(ParmParse.from_string(AMR_CFG))
    driver = RunDriver(ctx, out_dir=str(tmp_path))
    driver.run(max_steps=2, verbose=False)
    with h5py.File(tmp_path / "chkpt_final.hdf5") as f:
        # root header (writeCheckpointHeader)
        assert f.attrs["lambda_component"] == b"lambda"
        assert f.attrs["ccPressure_component"] == b"ccPressure"
        assert f.attrs["eLambda_component"] == b"eLambda"
        assert int(f.attrs["num_components"]) == 1
        assert int(f["Chombo_global"].attrs["SpaceDim"]) == 2

        for ilev in (0, 1):
            g = f[f"level_{ilev}"]
            # level header attrs (writeCheckpointLevel)
            for key in ("step_number", "ref_ratio", "vec_dx", "dt",
                        "time", "cfl", "finest_level", "is_empty",
                        "prob_domain", "is_periodic_0", "is_periodic_1"):
                assert key in g.attrs, (ilev, key)
            assert int(g.attrs["finest_level"]) == 1
            boxes = np.asarray(g["boxes"])
            assert "Processors" in g
            # every checkpoint LevelData the reference writes is present
            # with consistent offsets
            for name, ncomp in (("new_velocity", 2), ("old_velocity", 2),
                                ("new_lambda", 1), ("old_lambda", 1),
                                ("new_scalar_component_0", 1),
                                ("old_scalar_component_0", 1),
                                ("ccPressure", 1), ("eLambda", 1)):
                data = np.asarray(g[f"{name}:datatype=0"])
                offs = np.asarray(g[f"{name}:offsets=0"])
                assert len(offs) == len(boxes) + 1
                assert offs[0] == 0 and offs[-1] == data.size
                ga = g[f"{name}_attributes"]
                assert int(ga.attrs["comps"]) == ncomp
                assert ga.attrs["objectType"] == b"FArrayBox"
                assert np.all(np.isfinite(data))

        # flat Chombo data matches the native resume datasets exactly
        g0 = f["level_0"]
        nat = np.asarray(g0["new_velocity_0"], np.float64)
        flat = np.asarray(g0["new_velocity:datatype=0"])
        np.testing.assert_array_equal(flat[:nat.size].reshape(nat.shape),
                                      nat)
        nat_b = np.asarray(g0["new_scalar_0"], np.float64)
        flat_b = np.asarray(g0["new_scalar_component_0:datatype=0"])
        np.testing.assert_array_equal(flat_b.reshape(nat_b.shape), nat_b)
        # fine level: Chombo stores the interior of the ext patch
        g1 = f["level_1"]
        b0 = np.asarray(g1["boxes"])[0]
        nxb = int(b0["hi_i"]) - int(b0["lo_i"]) + 1
        nyb = int(b0["hi_j"]) - int(b0["lo_j"]) + 1
        flat1 = np.asarray(g1["new_scalar_component_0:datatype=0"])
        offs1 = np.asarray(g1["new_scalar_component_0:offsets=0"])
        blk = flat1[offs1[0]:offs1[1]].reshape(nyb, nxb)
        nat1 = np.asarray(g1["new_scalar_0"], np.float64)
        halo = driver.hierarchy.couplings[0].halo
        core = nat1[0] if nat1.ndim == 3 else nat1
        np.testing.assert_array_equal(blk, core[:, halo:halo + nxb]
                                      if core.shape[0] == nyb
                                      else core[halo:halo + nyb, :])
