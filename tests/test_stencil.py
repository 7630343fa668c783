"""Unit tests: mapped stencil calculus (manufactured solutions)."""

import numpy as np
import jax.numpy as jnp

from somar_tpu.core.grid import Grid
from somar_tpu.core.bc import BC, FieldBCs
from somar_tpu.geometry.geo_source import CartesianMap, TwistedMap
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.ops.stencil import (
    mac_gradient, mac_divergence, cc_gradient, cc_to_fc, fc_to_cc, vorticity)


def _periodic_setup(n, ndim=2, geo=None):
    g = Grid(nx=(n,) * ndim, dx=(1.0 / n,) * ndim, periodic=(True,) * ndim)
    lg = build_level_geometry(g, geo or CartesianMap())
    bcs = FieldBCs.uniform(BC.periodic(), ndim)
    return g, lg, bcs


def test_mac_grad_div_laplacian_cartesian():
    """div(grad(phi)) converges to the Laplacian, periodic Cartesian."""
    errs = []
    for n in (32, 64):
        g, lg, bcs = _periodic_setup(n)
        x, z = g.coords()
        k = 2 * np.pi
        phi = jnp.asarray(np.sin(k * x) * np.cos(k * z) * np.ones(g.shape))
        lap = mac_divergence(mac_gradient(phi, lg, bcs), lg)
        exact = -2 * k**2 * np.sin(k * np.asarray(x)) * np.cos(k * np.asarray(z))
        errs.append(float(jnp.max(jnp.abs(lap - exact))))
    order = np.log2(errs[0] / errs[1])
    assert order > 1.8, (errs, order)


def test_mac_laplacian_twisted_convergence():
    """Mapped Laplacian on the twisted mesh converges at 2nd order."""
    errs = []
    for n in (32, 64):
        geo = TwistedMap((0.04, 0.04), (1.0, 1.0))
        g, lg, bcs = _periodic_setup(n, geo=geo)
        # phi defined in PHYSICAL coordinates -> Laplacian is coordinate-free
        xph = np.broadcast_to(geo.phys_coor(0, g.coords()), g.shape)
        zph = np.broadcast_to(geo.phys_coor(1, g.coords()), g.shape)
        k = 2 * np.pi
        phi = jnp.asarray(np.sin(k * xph) * np.cos(k * zph))
        lap = mac_divergence(mac_gradient(phi, lg, bcs), lg)
        exact = -2 * k**2 * np.sin(k * xph) * np.cos(k * zph)
        errs.append(float(jnp.max(jnp.abs(np.asarray(lap) - exact))))
    order = np.log2(errs[0] / errs[1])
    assert order > 1.5, (errs, order)


def test_divergence_of_solenoidal_field_is_small():
    n = 64
    g, lg, bcs = _periodic_setup(n)
    x, z = g.coords((1, 0)), None
    k = 2 * np.pi
    # MAC streamfunction construction: u = dpsi/dz, w = -dpsi/dx with psi on
    # nodes gives exactly divergence-free discrete fluxes
    xf = g.fc_coord_1d(0)
    zf = g.fc_coord_1d(1)
    xn = xf.reshape(1, -1)
    zn = zf.reshape(-1, 1)
    psi = np.sin(k * xn) * np.sin(k * zn)   # nodal
    # u flux at x-faces: difference of psi in z
    u = jnp.asarray(np.diff(psi, axis=0))   # (nz, nx+1)
    w = jnp.asarray(-np.diff(psi, axis=1))  # (nz+1, nx)
    div = mac_divergence((u / g.dx[1], w / g.dx[0]), lg)
    assert float(jnp.max(jnp.abs(div))) < 1e-4


def test_cc_to_fc_round_trip_linear_exact():
    g = Grid(nx=(8, 8), dx=(0.125, 0.125))
    bcs = FieldBCs.uniform(BC.extrap(1), 2)
    x, _ = g.coords()
    f = jnp.broadcast_to(jnp.asarray(3.0 * x + 1.0), g.shape)
    fc = cc_to_fc(f, 0, g, bcs)
    xf = g.coords((1, 0))[0]
    np.testing.assert_allclose(np.asarray(fc), np.broadcast_to(
        3.0 * np.asarray(xf) + 1.0, g.fc_shape(0)), atol=1e-5)
    back = fc_to_cc(fc, 0, g)
    np.testing.assert_allclose(np.asarray(back), np.asarray(f), atol=1e-5)


def test_cc_gradient_linear_field():
    g, lg, bcs = _periodic_setup(16)
    x, z = g.coords()
    k = 2 * np.pi
    phi = jnp.asarray(np.sin(k * x) * np.ones(g.shape))
    grad = cc_gradient(phi, lg, bcs)
    # d/dx component approximates k cos(kx)
    exact = k * np.cos(k * np.asarray(x)) * np.ones(g.shape)
    # 2-pt face avg of face-centered differences == centered 2dx stencil;
    # still 2nd order
    assert float(np.max(np.abs(np.asarray(grad[0]) - exact))) < 0.05 * k
    assert float(np.max(np.abs(np.asarray(grad[1])))) < 1e-4


def test_vorticity_solid_body_rotation():
    n = 32
    g, lg, bcs = _periodic_setup(n)
    x, z = g.coords()
    xs = np.broadcast_to(np.asarray(x), g.shape) - 0.5
    zs = np.broadcast_to(np.asarray(z), g.shape) - 0.5
    vel = jnp.stack([jnp.asarray(-zs), jnp.asarray(xs)])
    bcs2 = [FieldBCs.uniform(BC.extrap(1), 2)] * 2
    w = vorticity(vel, lg, bcs2)
    np.testing.assert_allclose(np.asarray(w[1:-1, 1:-1]), 2.0, atol=1e-4)
