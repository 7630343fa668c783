"""Mapped norms/sums (computeMappedNorm/Sum parity) + FC transfer ops."""

import numpy as np
import jax
import jax.numpy as jnp

from somar_tpu.core.grid import Grid
from somar_tpu.geometry.geo_source import CartesianMap, TwistedMap
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.ops.norms import (composite_mapped_sum, mapped_norm,
                                 mapped_sum)
from somar_tpu.amr.transfer import prolong_linear_fc, restrict_average_fc


def test_mapped_sum_uniform():
    g = Grid(nx=(16, 8), dx=(0.5, 0.25))
    geo = build_level_geometry(g, CartesianMap())
    f = jnp.asarray(np.random.default_rng(0).normal(size=g.shape))
    expect = float(np.sum(np.asarray(f))) * 0.5 * 0.25
    np.testing.assert_allclose(float(mapped_sum(f, geo)), expect, rtol=1e-5)
    np.testing.assert_allclose(float(mapped_norm(f, geo, 0)),
                               float(np.max(np.abs(np.asarray(f)))),
                               rtol=1e-6)
    two = float(mapped_norm(f, geo, 2))
    expect2 = np.sqrt(np.sum(np.asarray(f) ** 2) * 0.5 * 0.25)
    np.testing.assert_allclose(two, expect2, rtol=1e-5)


def test_mapped_sum_twisted_volume():
    """integral of 1 * J dXi = physical volume, any volume-preserving-in-
    total map (reference: the J-weighted COMPUTEMAPPEDSUM)."""
    g = Grid(nx=(32, 32), dx=(1.0 / 32, 1.0 / 32))
    geo = build_level_geometry(g, TwistedMap((0.1, 0.1), (1.0, 1.0)))
    vol = float(mapped_sum(jnp.ones(g.shape), geo))
    np.testing.assert_allclose(vol, 1.0, rtol=2e-3)


def test_composite_sum_telescopes():
    """After average-down, the covered-region-masked composite sum equals
    the level-0 sum (fine average replaces the parent data exactly)."""
    from somar_tpu.amr.hierarchy import AMRHierarchy
    from somar_tpu.amr.tagging import TagParams
    from somar_tpu.physics.navier_stokes import NSParams
    from somar_tpu.problems.lock_exchange import LockExchange
    from somar_tpu.solvers.multigrid import MGParams

    Lx, Lz = 15.0, 2.0
    nx, nz = 48, 12
    g = Grid(nx=(nx, nz), dx=(Lx / nx, Lz / nz), x0=(-Lx / 2, 0.0))
    geo = build_level_geometry(g, CartesianMap())
    params = NSParams(nu=0.0, kappa=(0.0,), gravity_method=1,
                      mg=MGParams(eps=1e-5, imax=10))
    h = AMRHierarchy(geo, LockExchange(pert_amp=0.0), params, ratio=(4, 1),
                     tag_params=TagParams(buoyancy_tag_tol=0.2, tags_grow=1))
    s0 = h.level0.initial_state()
    s1, origin = h.initial_patch_state(s0)
    # make the fine data differ, then average down => telescoping holds
    s1b = s1
    import dataclasses
    s1b = dataclasses.replace(
        s1, scalars=s1.scalars + 0.01 * jnp.sin(jnp.arange(
            s1.scalars.shape[-1]) * 0.7))
    s0b = h.average_down(s0, s1b, origin)
    comp = float(composite_mapped_sum(h, [s0b.scalars[0], s1b.scalars[0]],
                                      [origin]))
    lvl0 = float(mapped_sum(s0b.scalars[0], h.level0.geo))
    np.testing.assert_allclose(comp, lvl0, rtol=2e-5, atol=1e-5)


def test_restrict_average_fc_linear_exact():
    # x-normal faces of a (z,x) grid: positions x = i*dx
    g = Grid(nx=(8, 4), dx=(0.5, 1.0))
    gf = Grid(nx=(32, 8), dx=(0.125, 0.5))     # ratio (4, 2)
    xf = np.arange(33) * 0.125
    f = np.broadcast_to(3.0 * xf[None, :], (8, 33))
    c = restrict_average_fc(jnp.asarray(f), 0, gf, (4, 2))
    assert c.shape == (4, 9)
    xc = np.arange(9) * 0.5
    np.testing.assert_allclose(np.asarray(c), np.broadcast_to(
        3.0 * xc[None, :], (4, 9)), atol=1e-6)


def test_prolong_restrict_fc_roundtrip():
    g = Grid(nx=(8, 4), dx=(0.5, 1.0))
    rng = np.random.default_rng(1)
    c = jnp.asarray(rng.normal(size=(4, 9)))   # x-normal faces, (z, x+1)
    f = prolong_linear_fc(c, 0, g, (4, 2))
    assert f.shape == (8, 33)
    gf = Grid(nx=(32, 8), dx=(0.125, 0.5))
    back = restrict_average_fc(f, 0, gf, (4, 2))
    # coincident planes are exact; tangential mean of limited-linear
    # interp reproduces the coarse value
    np.testing.assert_allclose(np.asarray(back), np.asarray(c), atol=1e-6)


def test_restrict_average_fc_harmonic():
    gf = Grid(nx=(8, 4), dx=(0.5, 0.5))
    f = jnp.full((4, 9), 2.0)
    c = restrict_average_fc(f, 0, gf, (2, 2), harmonic=True)
    np.testing.assert_allclose(np.asarray(c), 2.0, atol=1e-6)
