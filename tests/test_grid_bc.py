"""Unit tests: Grid index algebra and BC ghost fills."""

import numpy as np
import jax.numpy as jnp

from somar_tpu.core.grid import Grid
from somar_tpu.core.bc import BC, BCType, FieldBCs, fill_ghosts_cc, apply_fc_bc


def test_grid_axes_2d():
    g = Grid(nx=(8, 4), dx=(0.5, 0.25))
    assert g.ndim == 2
    assert g.shape == (4, 8)          # (nz, nx)
    assert g.axis(0) == 1 and g.axis(1) == 0
    assert g.vertical_dir == 1
    assert g.fc_shape(0) == (4, 9)
    assert g.fc_shape(1) == (5, 8)


def test_grid_axes_3d_and_refine():
    g = Grid(nx=(8, 6, 4), dx=(1.0, 1.0, 1.0))
    assert g.shape == (4, 6, 8)
    g2 = g.refine((4, 1, 2))
    assert g2.nx == (32, 6, 8)
    assert g2.dx == (0.25, 1.0, 0.5)
    assert g2.coarsen((4, 1, 2)).nx == g.nx


def test_grid_coords():
    g = Grid(nx=(4, 2), dx=(0.25, 0.5), x0=(-0.5, 0.0))
    x, z = g.coords()
    assert x.shape == (1, 4) and z.shape == (2, 1)
    np.testing.assert_allclose(np.ravel(x), [-0.375, -0.125, 0.125, 0.375])
    np.testing.assert_allclose(np.ravel(z), [0.25, 0.75])
    xf, _ = g.coords((1, 0))
    np.testing.assert_allclose(np.ravel(xf), [-0.5, -0.25, 0.0, 0.25, 0.5])


def test_periodic_ghosts():
    g = Grid(nx=(4, 4), dx=(1.0, 1.0), periodic=(True, True))
    bcs = FieldBCs.uniform(BC.periodic(), 2)
    f = jnp.arange(16.0).reshape(4, 4)
    p = fill_ghosts_cc(f, g, bcs, 2)
    assert p.shape == (8, 8)
    np.testing.assert_allclose(p[2:6, 0], f[:, 2])
    np.testing.assert_allclose(p[0, 2:6], f[2, :])


def test_dirichlet_ghosts_exact_for_linear():
    # phi = x; Dirichlet face values at x=0 and x=1 -> ghosts continue linearly
    g = Grid(nx=(4, 2), dx=(0.25, 0.5))
    x, _ = g.coords()
    f = jnp.broadcast_to(jnp.asarray(x), g.shape)
    bcs = FieldBCs(
        lo=(BC.dirichlet(0.0), BC.extrap(1)),
        hi=(BC.dirichlet(1.0), BC.extrap(1)),
    )
    p = fill_ghosts_cc(f, g, bcs, 2)
    # along x (axis 1): ghost cells continue phi = x exactly
    np.testing.assert_allclose(p[2, :], np.asarray(
        [-0.375, -0.125, 0.125, 0.375, 0.625, 0.875, 1.125, 1.375]), atol=1e-6)


def test_neumann_ghosts_exact_for_linear():
    # phi = 2x; Neumann dphi/dx = 2 at both faces
    g = Grid(nx=(4, 2), dx=(0.25, 0.5))
    x, _ = g.coords()
    f = jnp.broadcast_to(2.0 * jnp.asarray(x), g.shape)
    bcs = FieldBCs(
        lo=(BC.neumann(2.0), BC.extrap(1)),
        hi=(BC.neumann(2.0), BC.extrap(1)),
    )
    p = fill_ghosts_cc(f, g, bcs, 1)
    np.testing.assert_allclose(p[1, :], 2.0 * np.asarray(
        [-0.125, 0.125, 0.375, 0.625, 0.875, 1.125]), atol=1e-6)


def test_extrap2_ghosts_exact_for_quadratic():
    g = Grid(nx=(5, 2), dx=(0.2, 0.5))
    x, _ = g.coords()
    xv = np.ravel(np.asarray(x))
    f = jnp.broadcast_to(jnp.asarray(x) ** 2, g.shape)
    bcs = FieldBCs.uniform(BC.extrap(2), 2)
    p = fill_ghosts_cc(f, g, bcs, (2, 0))
    xg = np.concatenate([[xv[0] - 0.4, xv[0] - 0.2], xv, [xv[-1] + 0.2, xv[-1] + 0.4]])
    np.testing.assert_allclose(p[0, :], xg ** 2, atol=1e-5)


def test_apply_fc_bc_pins_faces():
    g = Grid(nx=(4, 3), dx=(1.0, 1.0))
    flux = jnp.ones(g.fc_shape(0))
    bcs = FieldBCs(lo=(BC.dirichlet(0.0), BC.extrap(0)),
                   hi=(BC.dirichlet(0.0), BC.extrap(0)))
    out = apply_fc_bc(flux, 0, g, bcs)
    np.testing.assert_allclose(out[:, 0], 0.0)
    np.testing.assert_allclose(out[:, -1], 0.0)
    np.testing.assert_allclose(out[:, 1:-1], 1.0)


def test_time_dependent_bc_values():
    """BC.value may be a callable t -> value (reference:
    EllipticBCValueFunc receives position AND time,
    EllipticBCInterface.H:52-64): at_time(t) binds it as a traced
    operand, and the bound fill matches the equivalent static fill."""
    import jax

    g = Grid(nx=(4, 3), dx=(0.25, 0.25))
    f = jnp.ones(g.shape)
    ramp = lambda t: 2.0 * jnp.minimum(1.0, t / 0.5)
    bcs = FieldBCs(lo=(BC.dirichlet(ramp), BC.extrap(1)),
                   hi=(BC.dirichlet(ramp), BC.extrap(1)))
    assert bcs.time_dependent
    assert not bcs.homogeneous().at_time(0.3).time_dependent

    fill = jax.jit(lambda t: fill_ghosts_cc(f, g, bcs.at_time(t), 1))
    for t, v in ((0.0, 0.0), (0.25, 1.0), (9.0, 2.0)):
        got = fill(jnp.asarray(t))
        want = fill_ghosts_cc(
            f, g, FieldBCs(lo=(BC.dirichlet(v), BC.extrap(1)),
                           hi=(BC.dirichlet(v), BC.extrap(1))), 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
    # unbound callables fail loudly, not silently
    import pytest
    with pytest.raises(AssertionError, match="at_time"):
        fill_ghosts_cc(f, g, bcs, 1)


def test_time_dependent_bc_no_retrace():
    """Binding time as a traced operand must NOT retrace per time value
    (the reference re-evaluates BC functors every fill; the TPU design
    cannot afford a recompile per step)."""
    import jax

    g = Grid(nx=(4, 3), dx=(0.25, 0.25))
    f = jnp.ones(g.shape)
    calls = []

    def ramp(t):
        calls.append(1)
        return 1.0 + 0.0 * t

    bcs = FieldBCs(lo=(BC.dirichlet(ramp), BC.extrap(1)),
                   hi=(BC.dirichlet(ramp), BC.extrap(1)))
    fill = jax.jit(lambda t: fill_ghosts_cc(f, g, bcs.at_time(t), 1))
    fill(jnp.asarray(0.1))
    n0 = len(calls)
    fill(jnp.asarray(0.7))
    fill(jnp.asarray(1.3))
    assert len(calls) == n0, "time value retraced the fill"
