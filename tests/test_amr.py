"""AMR hierarchy tests: transfers, tagging, subcycled advance, regrid."""

import numpy as np
import jax
import jax.numpy as jnp

from somar_tpu.core.grid import Grid
from somar_tpu.geometry.geo_source import CartesianMap
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.physics.navier_stokes import NSParams
from somar_tpu.solvers.multigrid import MGParams
from somar_tpu.problems.lock_exchange import LockExchange
from somar_tpu.amr.hierarchy import AMRHierarchy
from somar_tpu.amr.tagging import TagParams, compute_tags
from somar_tpu.amr.transfer import prolong_linear, restrict_average


def test_prolong_restrict_consistency():
    g = Grid(nx=(8, 4), dx=(1.0, 1.0))
    c = jnp.asarray(np.random.default_rng(0).normal(size=g.shape))
    f = prolong_linear(c, g, (4, 2))
    assert f.shape == (8, 32)
    gf = Grid(nx=(32, 8), dx=(0.25, 0.5))
    back = restrict_average(f, gf, (4, 2))
    np.testing.assert_allclose(np.asarray(back), np.asarray(c), atol=1e-6)


def test_prolong_linear_exact_for_linear_field():
    g = Grid(nx=(8, 8), dx=(1.0, 1.0))
    x = np.arange(8) + 0.5
    c = jnp.asarray(np.broadcast_to(2.0 * x[None, :], g.shape))
    f = prolong_linear(c, g, (2, 1))
    xf = (np.arange(16) + 0.5) / 2
    expected = np.broadcast_to(2.0 * xf[None, :], (8, 16))
    np.testing.assert_allclose(np.asarray(f)[:, 1:-1], expected[:, 1:-1],
                               atol=1e-6)


def test_prolong_limited_no_overshoot():
    g = Grid(nx=(8, 2), dx=(1.0, 1.0))
    step = np.zeros(g.shape)
    step[:, 4:] = 1.0
    f = np.asarray(prolong_linear(jnp.asarray(step), g, (4, 1)))
    assert f.min() >= -1e-6 and f.max() <= 1.0 + 1e-6


def _hierarchy(nx=64, nz=16):
    Lx, Lz = 15.0, 2.0
    g = Grid(nx=(nx, nz), dx=(Lx / nx, Lz / nz), x0=(-Lx / 2, 0.0))
    geo = build_level_geometry(g, CartesianMap())
    params = NSParams(nu=1e-4, kappa=(1e-4,), gravity_method=1,
                      mg=MGParams(eps=1e-5, imax=12))
    return AMRHierarchy(geo, LockExchange(pert_amp=0.0), params,
                        ratio=(4, 1),
                        tag_params=TagParams(buoyancy_tag_tol=0.2,
                                             tags_grow=1))


def test_tagging_finds_interface():
    h = _hierarchy()
    s0 = h.level0.initial_state()
    tags = compute_tags(s0, h.level0, h.tag_params)
    assert tags.any()
    # tags extruded vertically and near the interface x=0 (column 32)
    cols = np.where(tags.any(axis=0))[0]
    assert 28 <= cols.mean() <= 36, cols
    assert tags[:, cols[0]].all()   # extruded


def test_amr_advance_stable_and_bounded():
    h = _hierarchy()
    s0 = h.level0.post_initialize(h.level0.initial_state())
    s1, origin = h.initial_patch_state(s0)
    step = jax.jit(h.advance)
    for _ in range(6):
        s0, s1 = step(s0, s1, origin, jnp.asarray(0.02))
    H = h.halo
    b_f = np.asarray(s1.scalars[0])[:, H:-H]
    b_c = np.asarray(s0.scalars[0])
    assert np.all(np.isfinite(b_f)) and np.all(np.isfinite(b_c))
    assert b_f.min() > -0.02 and b_f.max() < 1.02
    assert b_c.min() > -0.02 and b_c.max() < 1.02
    assert np.all(np.isfinite(np.asarray(s1.vel)))


def test_amr_fronts_move_and_match_coarse_run():
    from somar_tpu.problems.lock_exchange import front_positions
    h = _hierarchy()
    s0 = h.level0.post_initialize(h.level0.initial_state())
    s1, origin = h.initial_patch_state(s0)
    step = jax.jit(h.advance)
    dt = jnp.asarray(0.03)
    for _ in range(20):
        s0, s1 = step(s0, s1, origin, dt)
    xh, xl = front_positions(s0.scalars[0], h.level0.geo)
    # 0.6 time units at ~0.7 front speed: both fronts past +- one cell
    assert float(xh) < -0.1 and float(xl) > 0.1, (float(xh), float(xl))


def test_regrid_moves_patch_and_preserves_data():
    h = _hierarchy()
    s0 = h.level0.post_initialize(h.level0.initial_state())
    s1, origin = h.initial_patch_state(s0)
    step = jax.jit(h.advance)
    for _ in range(4):
        s0, s1 = step(s0, s1, origin, jnp.asarray(0.02))
    s1b, origin2 = h.regrid(s0, s1)
    assert s1b.vel.shape == s1.vel.shape
    # data in the overlap carried over: buoyancy stays bounded
    b = np.asarray(s1b.scalars[0])
    assert b.min() > -0.05 and b.max() < 1.05
    # continue stepping after regrid
    s0, s1b = step(s0, s1b, origin2, jnp.asarray(0.02))
    assert np.all(np.isfinite(np.asarray(s1b.vel)))


def test_subcycle_count():
    h = _hierarchy()
    assert h.nt == 4        # ratio (4,1) -> 4 fine substeps
    assert h.cf_dirs == (0,)
    assert h.span_dirs == (1,)
