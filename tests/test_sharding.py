"""Multi-chip sharding tests (subprocess: 8 virtual CPU devices).

The TPU analog of the reference's serial-vs-mpirun equivalence check
(SURVEY.md section 4.5): the sharded jitted step must produce the same
answer as the single-device step, and the explicit ppermute halo exchange
must agree with global slicing.
"""

import os
import subprocess
import sys

import pytest

_ENV = dict(os.environ)
_ENV.pop("PALLAS_AXON_POOL_IPS", None)
_ENV["JAX_PLATFORMS"] = "cpu"
_ENV["XLA_FLAGS"] = (_ENV.get("XLA_FLAGS", "")
                     + " --xla_force_host_platform_device_count=8").strip()


def _run(code: str):
    r = subprocess.run([sys.executable, "-c", code], env=_ENV,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + "\n" + r.stderr
    return r.stdout


def test_halo_exchange_matches_global():
    out = _run("""
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map
from somar_tpu.parallel.halo import halo_exchange

mesh = Mesh(np.asarray(jax.devices()), ("x",))
n = 64
x = jnp.arange(8.0 * n).reshape(8, n)

def local(blk):
    return halo_exchange(blk, "x", 1, 2, periodic=True)

f = shard_map(local, mesh=mesh, in_specs=P(None, "x"),
              out_specs=P(None, "x"))
padded = f(x)
# each shard contributes (8, n/8 + 4); global result interleaves halos —
# check one shard's content via direct comparison on shard 0's region
blk = x[:, :8]
left = x[:, -2:]
right = x[:, 8:10]
expect = jnp.concatenate([left, blk, right], axis=1)
got = padded[:, :12]
np.testing.assert_allclose(np.asarray(got), np.asarray(expect))
print("halo ok")
""")
    assert "halo ok" in out


_SLOW = os.environ.get("SOMAR_SLOW_TESTS", "0") != "1"
_SKIP_SLOW = pytest.mark.skipif(
    _SLOW, reason="8 virtual devices oversubscribe the 1-core CI host "
    "(~7 min); the CI driver validates the multichip path via "
    "__graft_entry__.dryrun_multichip. Set SOMAR_SLOW_TESTS=1 to run.")


@_SKIP_SLOW
def test_sharded_step_matches_single_device():
    out = _run("""
import numpy as np, jax, jax.numpy as jnp
from somar_tpu.parallel.mesh import make_mesh, shard_ns_state
import __graft_entry__ as ge

level, grid = ge._build_level(nx=32, nz=8, ny=8, mg_eps=1e-4)
state = level.initial_state()
dt = jnp.asarray(0.005, jnp.float32)
step = jax.jit(lambda s, d: level.advance(s, d))
ref = step(state, dt)

mesh = make_mesh(8, axes=("x",))
sharded = shard_ns_state(state, grid, mesh)
out = step(sharded, dt)
err = float(jnp.max(jnp.abs(out.vel - ref.vel)))
scale = float(jnp.max(jnp.abs(ref.vel))) + 1e-12
print("rel err:", err / scale)
assert err / scale < 1e-3, err / scale
print("sharded ok")
""")
    assert "sharded ok" in out


@_SKIP_SLOW
def test_dryrun_multichip():
    out = _run("""
import __graft_entry__ as ge
ge.dryrun_multichip(8)
""")
    assert "ok" in out


def test_sharded_step_parity_2dev():
    """ShardedNSStep (shard_map advection islands + GSPMD solves) must
    reproduce the single-device step to f32 roundoff — walls along the
    sharded direction (lock exchange) AND a periodic sharded direction
    (Taylor-Green)."""
    env = dict(_ENV)
    env["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=2").strip()
    r = subprocess.run([sys.executable, "-c", """
import numpy as np, jax, jax.numpy as jnp
from somar_tpu.parallel.mesh import make_mesh, shard_ns_state
from somar_tpu.parallel.sharded_step import ShardedNSStep
from somar_tpu.core.grid import Grid
from somar_tpu.geometry.geo_source import CartesianMap
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.physics.navier_stokes import NSLevel, NSParams
from somar_tpu.solvers.multigrid import MGParams
from somar_tpu.problems.taylor_green import TaylorGreen
import __graft_entry__ as ge

dt = jnp.asarray(0.005, jnp.float32)
mesh = make_mesh(2, axes=("x",))

# 3-step 3D lock exchange: viscosity + diffusion + explicit gravity,
# solid walls along the sharded x direction
level, grid = ge._build_level(nx=32, nz=8, ny=8, mg_eps=1e-6)
state0 = level.initial_state()
step = jax.jit(lambda s, d: level.advance(s, d))
ref = state0
for _ in range(3):
    ref = step(ref, dt)
ss = ShardedNSStep(level, mesh)
sstep = jax.jit(lambda s, d: ss.advance(s, d))
out = shard_ns_state(state0, grid, mesh)
for _ in range(3):
    out = sstep(out, dt)
for f in ("vel", "scalars", "lam", "mac_phi", "pressure"):
    a, b = getattr(out, f), getattr(ref, f)
    err = float(jnp.max(jnp.abs(a - b)))
    scale = float(jnp.max(jnp.abs(b))) + 1e-12
    # the projection potentials solve a SINGULAR Poisson problem: their
    # null-space component amplifies roundoff differences; the physical
    # fields see only the gradient
    tol = 1e-2 if f in ("mac_phi",) else 2e-5
    assert err / scale < tol, (f, err / scale)

# 2D Taylor-Green: periodic sharded direction (ppermute wrap halos)
g2 = Grid(nx=(32, 16), dx=(2 * np.pi / 32, 2 * np.pi / 16),
          periodic=(True, True))
geo2 = build_level_geometry(g2, CartesianMap())
lev2 = NSLevel(geo2, TaylorGreen(),
               NSParams(nu=1e-2, kappa=(0.0,), gravity_method=0,
                        mg=MGParams(eps=1e-6)))
s2 = lev2.initial_state()
r2 = jax.jit(lambda s, d: lev2.advance(s, d))(s2, dt)
ss2 = ShardedNSStep(lev2, mesh)
o2 = jax.jit(lambda s, d: ss2.advance(s, d))(shard_ns_state(s2, g2, mesh), dt)
err2 = float(jnp.max(jnp.abs(o2.vel - r2.vel)))
scale2 = float(jnp.max(jnp.abs(r2.vel))) + 1e-12
assert err2 / scale2 < 2e-5, err2 / scale2
print("sharded-step parity ok")
"""], env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + "\n" + r.stderr
    assert "sharded-step parity ok" in r.stdout


def test_sharded_step_parity_2d_mesh():
    """ShardedNSStep over the 2D ('y','x') ICI torus (the 3D production
    layout): a (2,2) mesh on the 3D lock exchange — walls along sharded
    x, periodic sharded y — reproduces the single-device step; corner
    halos ride the sequential per-axis ppermute exchanges."""
    env = dict(_ENV)
    env["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=4").strip()
    r = subprocess.run([sys.executable, "-c", """
import numpy as np, jax, jax.numpy as jnp
from somar_tpu.parallel.mesh import make_mesh, shard_ns_state
from somar_tpu.parallel.sharded_step import ShardedNSStep
import __graft_entry__ as ge

dt = jnp.asarray(0.005, jnp.float32)
level, grid = ge._build_level(nx=32, nz=8, ny=12, mg_eps=1e-6)
state0 = level.initial_state()
step = jax.jit(lambda s, d: level.advance(s, d))
ref = state0
for _ in range(3):
    ref = step(ref, dt)
mesh = make_mesh(4, axes=("y", "x"))
assert dict(mesh.shape) == {"y": 2, "x": 2}, mesh.shape
ss = ShardedNSStep(level, mesh)
assert len(ss.sharded) == 2, ss.sharded
sstep = jax.jit(lambda s, d: ss.advance(s, d))
out = shard_ns_state(state0, grid, mesh)
for _ in range(3):
    out = sstep(out, dt)
for f in ("vel", "scalars", "lam", "mac_phi", "pressure"):
    a, b = getattr(out, f), getattr(ref, f)
    err = float(jnp.max(jnp.abs(a - b)))
    scale = float(jnp.max(jnp.abs(b))) + 1e-12
    tol = 1e-2 if f in ("mac_phi",) else 2e-5
    assert err / scale < tol, (f, err / scale)
print("2d-mesh sharded-step parity ok")
"""], env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + "\n" + r.stderr
    assert "2d-mesh sharded-step parity ok" in r.stdout


def test_amr_island_matches_gspmd():
    """attach_mesh: the AMR hierarchy's level advances run as shard_map
    islands (Pallas-safe, explicit halos) and must reproduce the pure
    GSPMD jnp step — base level everywhere, patch level on its interior
    (the island omits the ring-gradient flux correction at the outermost
    CF-halo faces, whose cells the subcycled advance overwrites from the
    donor each substep)."""
    env = dict(_ENV)
    env["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=2").strip()
    r = subprocess.run([sys.executable, "-c", """
import numpy as np, jax, jax.numpy as jnp
from somar_tpu.parallel.mesh import make_mesh, shard_ns_state
from somar_tpu.amr.hierarchy import AMRHierarchy
from somar_tpu.amr.tagging import TagParams
from somar_tpu.problems.lock_exchange import LockExchange
from somar_tpu.physics.navier_stokes import NSParams
from somar_tpu.solvers.multigrid import MGParams
import __graft_entry__ as ge

level, grid = ge._build_level(nx=32, nz=8, ny=8, mg_eps=1e-6)
params = NSParams(nu=1e-4, kappa=(1e-4,), gravity_method=1, cfl=0.9,
                  mg=MGParams(eps=1e-6, imax=12))
h = AMRHierarchy(level.geo, LockExchange(), params, ratio=(2, 1, 1),
                 tag_params=TagParams(buoyancy_tag_tol=0.2, tags_grow=1))
s0 = h.level0.post_initialize(h.level0.initial_state())
fine, origin = h.initial_patch_state(s0)
mesh = make_mesh(2, axes=("x",))
s0 = shard_ns_state(s0, grid, mesh)
fine = shard_ns_state(fine, h.couplings[0].ext_grid, mesh)
dt = jnp.asarray(0.005, jnp.float32)

ref0, ref1 = jax.jit(h.advance)(s0, fine, origin, dt)
n = h.attach_mesh(mesh)
assert n >= 2, n
out0, out1 = jax.jit(h.advance)(s0, fine, origin, dt)

mask = np.asarray(h.couplings[0]._halo_mask)
for f in ("vel", "scalars", "lam"):
    a, b = np.asarray(getattr(out0, f)), np.asarray(getattr(ref0, f))
    scale = np.abs(b).max() + 1e-12
    assert np.max(np.abs(a - b)) / scale < 2e-5, (f, "base")
    a1, b1 = np.asarray(getattr(out1, f)), np.asarray(getattr(ref1, f))
    interior = ~mask
    err = np.max(np.abs((a1 - b1)) * interior) / (np.abs(b1).max() + 1e-12)
    assert err < 2e-5, (f, "patch", err)
print("amr island parity ok")
"""], env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + "\n" + r.stderr
    assert "amr island parity ok" in r.stdout


@_SKIP_SLOW
def test_sharded_step_parity_8dev():
    out = _run("""
import numpy as np, jax, jax.numpy as jnp
from somar_tpu.parallel.mesh import make_mesh, shard_ns_state
from somar_tpu.parallel.sharded_step import ShardedNSStep
import __graft_entry__ as ge

level, grid = ge._build_level(nx=64, nz=8, ny=8, mg_eps=1e-5)
state = level.initial_state()
dt = jnp.asarray(0.005, jnp.float32)
ref = jax.jit(lambda s, d: level.advance(s, d))(state, dt)
mesh = make_mesh(8, axes=("x",))
ss = ShardedNSStep(level, mesh)
out = jax.jit(lambda s, d: ss.advance(s, d))(
    shard_ns_state(state, grid, mesh), dt)
err = float(jnp.max(jnp.abs(out.vel - ref.vel)))
scale = float(jnp.max(jnp.abs(ref.vel))) + 1e-12
assert err / scale < 2e-5, err / scale
print("8dev sharded ok")
""")
    assert "8dev sharded ok" in out


def test_driver_multichip_matches_single_device(tmp_path):
    """The RunDriver itself is rank-transparent (the mpirun analog,
    README.md:66): the same input file on a 2-device mesh reproduces the
    single-device answer — sharding is a driver capability, not a test
    harness."""
    code = """
import numpy as np
from somar_tpu.config.parmparse import ParmParse
from somar_tpu.config.context import ProblemContext
from somar_tpu.driver import RunDriver
import jax

CFG = '''
amr.nx = 32 8 8
amr.length = 15.0 2.0 2.0
amr.nx_offset = -16 0 0
amr.isPeriodic = 0 1 0
ibc.problem = 1
amr.gravityMethod = 1
amr.viscosity = 1e-4
amr.scal_diffusion_coeffs = 1e-4
amr.fixed_dt = 0.005
amr.maxsteps = 3
amr.final = 10.0
AMRMG.eps = 1e-6
amr.verbosity = 0
'''
import tempfile
ctx = ProblemContext.from_parmparse(ParmParse.from_string(CFG))
driver = RunDriver(ctx, out_dir=tempfile.mkdtemp())
print("mesh:", None if driver.mesh is None else driver.mesh.shape)
assert driver.mesh is not None and len(jax.devices()) == 2
state, steps = driver.run(verbose=False)
np.save("/tmp/sharded_drv.npy", np.asarray(state.vel))
print("driver sharded ok")
"""
    env = dict(_ENV)
    env["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=2").strip()
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + "\n" + r.stderr
    assert "driver sharded ok" in r.stdout

    env1 = dict(_ENV)
    env1["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
    code1 = code.replace('assert driver.mesh is not None and '
                         'len(jax.devices()) == 2',
                         'assert driver.mesh is None') \
                .replace('/tmp/sharded_drv.npy', '/tmp/single_drv.npy')
    r1 = subprocess.run([sys.executable, "-c", code1], env=env1,
                        capture_output=True, text=True, timeout=900)
    assert r1.returncode == 0, r1.stdout + "\n" + r1.stderr

    import numpy as np
    a = np.load("/tmp/sharded_drv.npy")
    b = np.load("/tmp/single_drv.npy")
    scale = np.abs(b).max() + 1e-12
    assert np.max(np.abs(a - b)) / scale < 1e-4, \
        np.max(np.abs(a - b)) / scale


def test_pallas_gate_shard_locality(monkeypatch):
    """Pallas feature gates: off by default on a multi-device process,
    on inside a shard_map island (pallas_scope(True)), env override wins
    (VERDICT r2 item 1a: no unguarded Pallas custom call reachable inside
    a GSPMD-partitioned jit)."""
    import jax
    from somar_tpu.parallel import pallas_gate
    from somar_tpu.physics.godunov import _use_pallas_predictor
    from somar_tpu.solvers.poisson_op import _use_fused_gsrb

    monkeypatch.delenv("SOMAR_PALLAS", raising=False)
    monkeypatch.delenv("SOMAR_FUSED_GSRB", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    # multi-device process, no scope -> unsafe -> off
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 8)
    assert not _use_pallas_predictor()
    assert not _use_fused_gsrb()
    # shard-local island -> on
    with pallas_gate.pallas_scope(True):
        assert _use_pallas_predictor()
        assert _use_fused_gsrb()
        # nested force-off wins
        with pallas_gate.pallas_scope(False):
            assert not _use_pallas_predictor()
    # single device -> on
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    assert _use_pallas_predictor()
    assert _use_fused_gsrb()
    # explicit GSPMD scope -> off even on one device
    with pallas_gate.pallas_scope(False):
        assert not _use_pallas_predictor()
    # env override beats the gate
    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 8)
    monkeypatch.setenv("SOMAR_PALLAS", "on")
    assert _use_pallas_predictor()
    monkeypatch.setenv("SOMAR_PALLAS", "off")
    with pallas_gate.pallas_scope(True):
        assert not _use_pallas_predictor()
