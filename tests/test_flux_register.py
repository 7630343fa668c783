"""Flux-register algebra test: conservation bookkeeping on synthetic fluxes."""

import numpy as np
import jax.numpy as jnp

from somar_tpu.core.grid import Grid
from somar_tpu.geometry.geo_source import CartesianMap
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.physics.navier_stokes import NSParams
from somar_tpu.problems.lock_exchange import LockExchange
from somar_tpu.amr.hierarchy import AMRHierarchy
from somar_tpu.amr.flux_register import PatchFluxRegister


def test_flux_register_zero_when_fluxes_match():
    """When the averaged fine flux equals the coarse flux the register is
    zero and reflux() is a no-op (the consistency identity behind
    MappedLevelFluxRegister)."""
    Lx, Lz = 8.0, 2.0
    g = Grid(nx=(32, 8), dx=(Lx / 32, Lz / 8), x0=(-Lx / 2, 0.0))
    geo = build_level_geometry(g, CartesianMap())
    h = AMRHierarchy(geo, LockExchange(pert_amp=0.0), NSParams(),
                     ratio=(4, 1))
    fr = PatchFluxRegister(h)
    s0 = h.level0.initial_state()
    s1, origin = h.initial_patch_state(s0)

    # constant flux fields: coarse and fine agree exactly
    cflux = tuple(2.5 * jnp.ones(g.fc_shape(d)) for d in range(2))
    fflux = tuple(2.5 * jnp.ones(h.ext_grid.fc_shape(d)) for d in range(2))

    reg = fr.zeros()
    for _ in range(h.nt):
        reg = fr.increment_fine(reg, fflux, 1.0 / h.nt)
    reg = fr.increment_coarse(reg, cflux, origin)
    for d in h.cf_dirs:
        lo, hi = reg[d]
        np.testing.assert_allclose(np.asarray(lo), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(hi), 0.0, atol=1e-5)

    field = jnp.ones(g.shape)
    out = fr.reflux(field, reg, origin, 0.1, geo)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_flux_register_reflux_corrects_outside_cells():
    """A uniform fine-flux excess refluxes only into the coarse cells
    adjacent to the CF interface, with opposite signs on the two sides."""
    Lx, Lz = 8.0, 2.0
    g = Grid(nx=(32, 8), dx=(Lx / 32, Lz / 8), x0=(-Lx / 2, 0.0))
    geo = build_level_geometry(g, CartesianMap())
    h = AMRHierarchy(geo, LockExchange(pert_amp=0.0), NSParams(),
                     ratio=(4, 1))
    fr = PatchFluxRegister(h)
    s0 = h.level0.initial_state()
    s1, origin = h.initial_patch_state(s0)

    cflux = tuple(jnp.zeros(g.fc_shape(d)) for d in range(2))
    fflux = tuple(jnp.ones(h.ext_grid.fc_shape(d)) for d in range(2))
    reg = fr.zeros()
    reg = fr.increment_fine(reg, fflux, 1.0)
    reg = fr.increment_coarse(reg, cflux, origin)

    dt, dx = 0.1, g.dx[0]
    field = jnp.zeros(g.shape)
    out = np.asarray(fr.reflux(field, reg, origin, dt, geo))
    # exactly two coarse columns touched, with +- dt/dx
    touched = np.where(np.abs(out).max(axis=0) > 0)[0]
    assert len(touched) == 2, touched
    lo_col, hi_col = touched
    np.testing.assert_allclose(out[:, lo_col], -dt / dx, rtol=1e-5)
    np.testing.assert_allclose(out[:, hi_col], +dt / dx, rtol=1e-5)
