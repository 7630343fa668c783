"""Unit tests: coordinate maps and LevelGeometry metric fields."""

import numpy as np
import jax.numpy as jnp

from somar_tpu.core.grid import Grid
from somar_tpu.geometry.geo_source import (
    CartesianMap, TwistedMap, CylindricalMap, StretchedCartesianMap)
from somar_tpu.geometry.bathymetric import LedgeMap, BeamGeneratorMap, DEMMap
from somar_tpu.geometry.level_geometry import build_level_geometry


def test_cartesian_is_trivial():
    g = Grid(nx=(8, 8), dx=(0.125, 0.125))
    lg = build_level_geometry(g, CartesianMap())
    assert lg.is_uniform and lg.is_diagonal
    np.testing.assert_allclose(lg.J, 1.0)
    assert lg.e_cc is None
    v = jnp.ones((2, 8, 8))
    assert lg.to_mapped(v) is v


def test_twisted_metric_consistency():
    # J * gup must equal J * inv(e) inv(e)^T; check det and symmetry
    L = (1.0, 1.0)
    geo = TwistedMap((0.05, 0.05), L)
    g = Grid(nx=(16, 16), dx=(1 / 16, 1 / 16), periodic=(True, True))
    xi = g.coords()
    J, gup, gdn, e, einv = geo.metrics(xi)
    # analytic derivative vs FD fallback of the base class
    fd = super(TwistedMap, geo).dxdxi(0, 1, xi)
    an, fd = np.broadcast_arrays(geo.dxdxi(0, 1, xi), fd)
    np.testing.assert_allclose(an, fd, atol=1e-7)
    # gup . gdn = identity
    prod = np.einsum("ij...,jk...->ik...", gup, gdn)
    np.testing.assert_allclose(prod[0, 0], 1.0, atol=1e-10)
    np.testing.assert_allclose(prod[0, 1], 0.0, atol=1e-10)
    # J > 0 for untangled mesh
    assert np.all(J > 0)


def test_twisted_basis_roundtrip():
    g = Grid(nx=(8, 8), dx=(1 / 8, 1 / 8), periodic=(True, True))
    lg = build_level_geometry(g, TwistedMap((0.05, 0.05), (1.0, 1.0)),
                              dtype=jnp.float32)
    v = jnp.stack([jnp.ones(g.shape), 2.0 * jnp.ones(g.shape)])
    back = lg.to_cartesian(lg.to_mapped(v))
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)


def test_cylindrical_jacobian_is_r():
    geo = CylindricalMap()
    g = Grid(nx=(8, 8), dx=(0.1, 2 * np.pi / 8), x0=(1.0, 0.0))
    xi = g.coords()
    J, gup, _, _, _ = geo.metrics(xi)
    r = np.broadcast_to(xi[0], g.shape)
    np.testing.assert_allclose(J, r, atol=1e-12)
    # g^{theta theta} = 1/r^2
    np.testing.assert_allclose(gup[1, 1], 1.0 / r**2, atol=1e-10)


def test_stretched_map_diagonal():
    geo = StretchedCartesianMap([lambda x: x**2 + x, lambda z: z])
    g = Grid(nx=(8, 4), dx=(0.1, 0.25), x0=(0.1, 0.0))
    xi = g.coords()
    d00 = geo.dxdxi(0, 0, xi)
    np.testing.assert_allclose(d00, 2 * np.asarray(xi[0]) + 1, rtol=1e-6)
    assert float(np.max(np.abs(geo.dxdxi(0, 1, xi)))) == 0.0


def test_ledge_map_depths():
    geo = LedgeMap((0.0, 1.0), hl=0.2, hr=1.0, xl=-1.0, xr=1.0)
    d = geo.depth([np.array([-5.0, 0.0, 5.0])])
    np.testing.assert_allclose(d, [0.2, 0.6, 1.0], atol=1e-12)
    # sigma map hits bottom and surface
    xi = [np.array([-5.0]), np.array([0.0])]   # zeta = z0 = bottom
    np.testing.assert_allclose(geo.phys_coor(1, xi), [-0.2], atol=1e-12)
    xi = [np.array([-5.0]), np.array([1.0])]   # zeta = top
    np.testing.assert_allclose(geo.phys_coor(1, xi), [0.0], atol=1e-12)


def test_ledge_levelgeometry_J_positive():
    geo = LedgeMap((0.0, 1.0), hl=0.2, hr=1.0, xl=-1.0, xr=1.0)
    g = Grid(nx=(16, 8), dx=(0.5, 1 / 8), x0=(-4.0, 0.0))
    lg = build_level_geometry(g, geo)
    assert np.all(np.asarray(lg.J) > 0)
    assert lg.Jgup_full is not None
    # vertical Jgup_diag ~ J * g^{zz} must be positive
    assert np.all(np.asarray(lg.Jgup_diag[1]) > 0)


def test_beam_generator_ridge():
    geo = BeamGeneratorMap((0.0, 1.0), full_depth=1.0, angle=np.deg2rad(10),
                           lx=40.0)
    x = np.linspace(-5, 5, 101)
    d = geo.depth([x])
    assert np.all(d > 0) and np.all(d <= 1.0 + 1e-12)
    assert d[50] < d[0]            # shallower over the ridge center
    np.testing.assert_allclose(d[0], 1.0, atol=1e-9)   # flat far field
    # C0 continuity / smoothness: no jumps bigger than slope*dx
    assert np.max(np.abs(np.diff(d))) < 0.3 * (x[1] - x[0]) + 1e-6


def test_dem_map_1d_matches_samples():
    xs = np.linspace(-2, 2, 21)
    ds = 1.0 + 0.3 * np.exp(-xs**2)
    geo = DEMMap((0.0, 1.0), xs, ds)
    np.testing.assert_allclose(geo.depth([xs]), ds, atol=1e-12)
    # gradient close to analytic
    xq = np.linspace(-1.5, 1.5, 7)
    np.testing.assert_allclose(
        geo.depth_grad([xq], 0), -2 * xq * 0.3 * np.exp(-xq**2), atol=5e-3)


def test_dem_map_reads_reference_data_files():
    """The reference's shipped DEM test data loads unchanged
    (src/geometry/maps/DEMMaps/DEM_test_{2d,3d}.hdf5)."""
    import os
    base = "/root/reference/src/geometry/maps/DEMMaps"
    if not os.path.exists(f"{base}/DEM_test_2d.hdf5"):
        import pytest
        pytest.skip("reference DEM data not present")
    import h5py
    with h5py.File(f"{base}/DEM_test_2d.hdf5") as f:
        x = np.asarray(f["X"])
        dmax = float(np.asarray(f["Depth"]).max())
    geo2 = DEMMap.from_hdf5((0.0, dmax), f"{base}/DEM_test_2d.hdf5", 2)
    xs = np.linspace(x.min(), x.max(), 33)
    d = geo2.depth([xs])
    assert np.all(np.isfinite(d))
    # a LevelGeometry builds on it with positive J
    g = Grid(nx=(16, 8), dx=((x.max() - x.min()) / 16, dmax / 8),
             x0=(float(x.min()), 0.0))
    lg = build_level_geometry(g, geo2)
    assert np.all(np.asarray(lg.J) > 0)

    geo3 = DEMMap.from_hdf5((0.0, dmax), f"{base}/DEM_test_3d.hdf5", 3)
    with h5py.File(f"{base}/DEM_test_3d.hdf5") as f:
        y = np.asarray(f["Y"])
    d3 = geo3.depth([np.linspace(x.min(), x.max(), 5)[:, None],
                     np.linspace(y.min(), y.max(), 4)[None, :]])
    assert d3.shape == (5, 4)
    assert np.all(np.isfinite(d3))
