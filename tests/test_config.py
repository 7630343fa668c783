"""Config system: the reference's shipped input files parse unchanged."""

import glob
import os

import numpy as np
import jax.numpy as jnp
import pytest

from somar_tpu.config.parmparse import ParmParse
from somar_tpu.config.context import ProblemContext, ProblemType, CoordMap
from somar_tpu.geometry.level_geometry import build_level_geometry

REF_INPUTS = sorted(glob.glob("/root/reference/exec/inputs.*.machine"))
PARSEABLE = [p for p in REF_INPUTS if "template" not in p]


def test_parmparse_basics():
    pp = ParmParse.from_string("""
    # comment
    amr.nx = 64 32          # trailing comment
    amr.cfl = 0.95
    geometry.coordMap = 5
    amr.isPeriodic = 1 0
    plot.plot_prefix = plot_
    """)
    assert pp.get_int_vect("amr.nx", 2) == (64, 32)
    assert pp.get_real("amr.cfl") == 0.95
    assert pp.get_int("geometry.coordMap") == 5
    assert pp.get_str("plot.plot_prefix") == "plot_"
    assert pp.get_int("missing.key", 7) == 7


@pytest.mark.parametrize("path", PARSEABLE, ids=[os.path.basename(p) for p in PARSEABLE])
def test_reference_inputs_parse(path):
    ctx = ProblemContext.from_file(path)
    assert ctx.amr.ndim in (2, 3)
    g = ctx.base_grid()
    assert g.ncells > 0
    assert len(ctx.ns.kappa) >= 1


def test_taylor_green_config_details():
    ctx = ProblemContext.from_file(
        "/root/reference/exec/inputs.TaylorGreen.machine")
    assert ctx.problem == ProblemType.TAYLOR_GREEN
    assert ctx.coord_map == CoordMap.CARTESIAN
    assert ctx.amr.nx == (64, 64)
    assert ctx.amr.is_periodic == (True, True)
    assert ctx.ns.fixed_dt == 0.0001
    assert ctx.ns.gravity_method == 0
    assert ctx.ns.nu == 0.0001
    assert not ctx.ns.advection_vel.use_limiting
    assert ctx.ns.mg.eps == 1e-12


def test_lock_exchange_2d_config_details():
    ctx = ProblemContext.from_file(
        "/root/reference/exec/inputs.LockExchange_Cartesian2D.machine")
    assert ctx.problem == ProblemType.LOCK_EXCHANGE
    assert ctx.amr.nx == (128, 64)
    assert ctx.amr.nx_offset == (-64, 0)
    assert ctx.amr.max_level == 1
    assert ctx.amr.ref_ratios == ((4, 1),)   # anisotropic refratio_lev0
    g = ctx.base_grid()
    np.testing.assert_allclose(g.x0[0], -15.0)


def test_problem_factory_all_types():
    base = """
    amr.nx = 16 16
    amr.length = 1.0 1.0
    ibc.problem = {p}
    ibc.useBackgroundScalar = {bg}
    """
    for ptype, bg in [(0, 0), (1, 0), (3, 1), (4, 0), (5, 0), (6, 0),
                      (7, 1), (8, 1)]:
        pp = ParmParse.from_string(base.format(p=ptype, bg=bg))
        ctx = ProblemContext.from_parmparse(pp)
        prob = ctx.new_problem()
        assert prob is not None
        # smoke test ICs on a small grid
        geo = build_level_geometry(ctx.base_grid(), ctx.new_geo_source())
        s = prob.scalar_ic(geo, 0)
        assert np.all(np.isfinite(np.asarray(s)))
        v = prob.vel_ic(geo)
        assert v.shape == (2, 16, 16)


def test_geo_factory_ledge_and_twisted():
    pp = ParmParse.from_string("""
    amr.nx = 16 8
    amr.length = 4.0 1.0
    geometry.coordMap = 5
    geometry.ledgeMapHl = 0.3
    geometry.ledgeMapHr = 0.9
    geometry.ledgeMapXl = -0.5
    geometry.ledgeMapXr = 0.5
    ibc.problem = 1
    """)
    ctx = ProblemContext.from_parmparse(pp)
    geo_src = ctx.new_geo_source()
    assert geo_src.name == "Ledge"
    lg = build_level_geometry(ctx.base_grid(), geo_src)
    assert np.all(np.asarray(lg.J) > 0)

    pp2 = ParmParse.from_string("""
    amr.nx = 16 16
    amr.length = 1.0 1.0
    geometry.coordMap = 1
    geometry.perturbations = 0.05 0.05
    ibc.problem = 4
    """)
    ctx2 = ProblemContext.from_parmparse(pp2)
    assert ctx2.new_geo_source().name == "Twisted"


def test_precision_knob_f64_run_mode(tmp_path):
    """`amr.precision = 64` runs the whole step in f64 (reference parity:
    SOMAR is all-double).  x64 is a global jax switch, so the probe runs
    in a subprocess; asserts the state dtype and finite physics."""
    import subprocess
    import sys

    code = """
import numpy as np, jax, jax.numpy as jnp
from somar_tpu.config.context import ProblemContext
ctx = ProblemContext.from_file(
    "/root/reference/exec/inputs.LockExchange_Cartesian2D.machine",
    ["amr.nx=48 16", "amr.nx_offset=-24 0", "amr.maxlevel=0",
     "amr.precision=64", "amr.fixed_dt=0.02", "amr.verbosity=0",
     "plot.plot_interval=-1", "plot.checkpoint_interval=-1"])
assert ctx.ns.dtype == jnp.float64, ctx.ns.dtype
from somar_tpu.driver import RunDriver
import tempfile
drv = RunDriver(ctx, out_dir=tempfile.mkdtemp())
level = drv.level
s = level.post_initialize(level.initial_state())
assert s.vel.dtype == jnp.float64, s.vel.dtype
step = jax.jit(lambda s, d: level.advance(s, d))
for _ in range(2):
    s = step(s, jnp.asarray(0.02, jnp.float64))
assert s.vel.dtype == jnp.float64
assert bool(jnp.all(jnp.isfinite(s.vel)))
print("OK")
"""
    import os
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


def test_precision_knob_rejects_garbage():
    import pytest
    from somar_tpu.config.context import ProblemContext
    with pytest.raises(ValueError, match="precision"):
        ProblemContext.from_file(
            "/root/reference/exec/inputs.LockExchange_Cartesian2D.machine",
            ["amr.precision=banana"])
