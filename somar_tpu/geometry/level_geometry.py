"""LevelGeometry: precomputed metric fields for one level.

Re-design of the reference's LevelGeometry
(`/root/reference/src/geometry/LevelGeometry.H:87`): where the reference
caches CC J / CC 1/J / FC Jgup in static maps keyed by BoxLayout
(LevelGeometry.H:395-409) and fills them with Fortran kernels, we compute
everything once host-side in float64 and hold device arrays in a pytree.
Uniform (Cartesian) grids store scalar leaves, so `J * x` and the basis
transforms constant-fold at trace time — the ortho/uniform fast paths of
the reference (isDiagonal/isUniform) become compile-time specialization.

Fields (logical direction d; array axis = grid.axis(d)):
  J        CC volume element det(dx/dxi)          (broadcastable to shape)
  Jinv     CC 1/J
  Jgup_diag[d]   J g^{dd} at faces normal to d    (always present)
  Jgup_full[d]   J g^{d,:} full row, shape (ndim,)+fc_shape(d)
                 (None when the metric is diagonal)
  e_cc     dx_mu/dxi_nu at CC, (ndim, ndim)+shape (None when uniform)
  einv_cc  dxi_mu/dx_nu at CC                     (None when uniform)
  gdn_cc   covariant metric at CC                 (None when uniform)

Velocity arrays have shape (ndim,)+shape with component index = logical
Cartesian direction.  `to_mapped` / `to_cartesian` mirror the reference's
sendToMappedBasis / sendToCartesianBasis (LevelGeometry.H:263-270).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from somar_tpu.core.grid import Grid
from somar_tpu.geometry.geo_source import GeoSource


class LevelGeometry:
    def __init__(self, grid: Grid, geo: GeoSource, *, J, Jinv, Jgup_diag,
                 Jgup_full, e_cc, einv_cc, gdn_cc):
        self.grid = grid
        self.geo = geo
        self.J = J
        self.Jinv = Jinv
        self.Jgup_diag = Jgup_diag
        self.Jgup_full = Jgup_full
        self.e_cc = e_cc
        self.einv_cc = einv_cc
        self.gdn_cc = gdn_cc

    # -------------------------------------------------------------- flags
    @property
    def is_uniform(self) -> bool:
        return self.geo.is_uniform

    @property
    def is_diagonal(self) -> bool:
        return self.geo.is_diagonal

    @property
    def ndim(self) -> int:
        return self.grid.ndim

    @property
    def dx(self):
        return self.grid.dx

    # ----------------------------------------------------- basis transforms
    def to_cartesian(self, vel_mapped):
        """Contravariant (mapped-basis) -> Cartesian components at CC."""
        if self.e_cc is None:
            return vel_mapped
        return jnp.einsum("mn...,n...->m...", self.e_cc, vel_mapped,
                          precision=jax.lax.Precision.HIGHEST)

    def to_mapped(self, vel_cart):
        """Cartesian -> contravariant (mapped-basis) components at CC."""
        if self.einv_cc is None:
            return vel_cart
        return jnp.einsum("mn...,n...->m...", self.einv_cc, vel_cart,
                          precision=jax.lax.Precision.HIGHEST)

    def mult_by_J(self, field):
        return field * self.J

    def div_by_J(self, field):
        return field * self.Jinv

    def contract_vectors(self, a, b):
        """g_ij a^i b^j for mapped-basis vectors (reference:
        LevelGeometry::contractVectors, LevelGeometry.H:311)."""
        if self.gdn_cc is None:
            return jnp.einsum("m...,m...->...", a, b,
                              precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("mn...,m...,n...->...", self.gdn_cc, a, b,
                          precision=jax.lax.Precision.HIGHEST)

    # -------------------------------------------------------------- coords
    def phys_coords_cc(self) -> Tuple[np.ndarray, ...]:
        """Physical cell-center coordinates (host numpy, broadcastable)."""
        xi = self.grid.coords()
        return tuple(
            np.asarray(self.geo.phys_coor(mu, xi)) for mu in range(self.ndim)
        )

    def phys_coords_fc(self, d: int) -> Tuple[np.ndarray, ...]:
        cent = [0] * self.ndim
        cent[d] = 1
        xi = self.grid.coords(cent)
        return tuple(
            np.asarray(self.geo.phys_coor(mu, xi)) for mu in range(self.ndim)
        )

    def displacement_cc(self):
        """x(xi) - xi at CC, for plotfiles (reference: plot.writeDisplacement)."""
        xi = self.grid.coords()
        out = []
        for mu in range(self.ndim):
            disp = np.asarray(self.geo.phys_coor(mu, xi)) - xi[mu]
            out.append(np.broadcast_to(disp, self.grid.shape))
        return np.stack(out)


def _pytree_flatten(lg: LevelGeometry):
    children = (lg.J, lg.Jinv, lg.Jgup_diag, lg.Jgup_full, lg.e_cc,
                lg.einv_cc, lg.gdn_cc)
    aux = (lg.grid, lg.geo)
    return children, aux


def _pytree_unflatten(aux, children):
    grid, geo = aux
    J, Jinv, Jgup_diag, Jgup_full, e_cc, einv_cc, gdn_cc = children
    return LevelGeometry(grid, geo, J=J, Jinv=Jinv, Jgup_diag=Jgup_diag,
                         Jgup_full=Jgup_full, e_cc=e_cc, einv_cc=einv_cc,
                         gdn_cc=gdn_cc)


jax.tree_util.register_pytree_node(LevelGeometry, _pytree_flatten, _pytree_unflatten)


def build_level_geometry(grid: Grid, geo: GeoSource, dtype=jnp.float32) -> LevelGeometry:
    """Precompute all metric fields (host-side float64, stored as `dtype`).

    Mirrors the metric definitions the reference fills via
    GeoSourceInterface::fill_J / fill_Jgup / fill_gdn
    (GeoSourceInterface.H:59-160) but evaluates them once per level.
    """
    ndim = grid.ndim

    if geo.is_uniform:
        one = jnp.asarray(1.0, dtype)
        return LevelGeometry(
            grid, geo,
            J=one, Jinv=one,
            Jgup_diag=tuple(one for _ in range(ndim)),
            Jgup_full=None, e_cc=None, einv_cc=None, gdn_cc=None,
        )

    def reorder(arr_logical: np.ndarray) -> np.ndarray:
        """Metric evaluation uses logical-direction broadcast; data axes are
        already vertical-major because grid.coords() shapes them that way."""
        return arr_logical

    # --- CC metrics
    xi_cc = grid.coords()
    J_cc, gup_cc, gdn_cc, e_cc, einv_cc = geo.metrics(xi_cc)
    shape = grid.shape
    J_cc = np.broadcast_to(reorder(J_cc), shape)

    # --- FC metrics: J g^{d, :} on faces normal to each logical dir d
    Jgup_diag = []
    Jgup_full = [] if not geo.is_diagonal else None
    for d in range(ndim):
        cent = [0] * ndim
        cent[d] = 1
        xi_fc = grid.coords(cent)
        J_fc, gup_fc, _, _, _ = geo.metrics(xi_fc)
        fshape = grid.fc_shape(d)
        Jgup_diag.append(jnp.asarray(
            np.broadcast_to(J_fc * gup_fc[d, d], fshape), dtype))
        if Jgup_full is not None:
            row = np.stack([np.broadcast_to(J_fc * gup_fc[d, j], fshape)
                            for j in range(ndim)])
            Jgup_full.append(jnp.asarray(row, dtype))

    def full(a):
        return jnp.asarray(np.broadcast_to(a, (ndim, ndim) + shape), dtype)

    return LevelGeometry(
        grid, geo,
        J=jnp.asarray(J_cc, dtype),
        Jinv=jnp.asarray(1.0 / J_cc, dtype),
        Jgup_diag=tuple(Jgup_diag),
        Jgup_full=tuple(Jgup_full) if Jgup_full is not None else None,
        e_cc=full(e_cc),
        einv_cc=full(einv_cc),
        gdn_cc=full(gdn_cc),
    )
