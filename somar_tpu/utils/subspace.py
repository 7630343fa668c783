"""Subspace utilities: dimension flattening / vertical integrals / extrusion.

Re-design of the reference's Subspace layer
(`/root/reference/src/utils/Subspace.H:38-61`: flattenBox,
verticalDataBox, horizontalDataBox; kernels AddExtrusion,
UnmappedVertIntegral) — the substrate of the leptic solver's
vertical/horizontal split.  On dense arrays these are reductions and
broadcasts along axis 0 (the vertical is always the leading array axis,
so every one of these ops is a fully-vectorized plane operation).
"""

from __future__ import annotations

import jax.numpy as jnp

from somar_tpu.core.grid import Grid


def flatten_grid(grid: Grid) -> Grid:
    """The horizontal grid: the vertical direction removed (reference:
    flattenBox, Subspace.H:39-46)."""
    v = grid.vertical_dir
    keep = [d for d in range(grid.ndim) if d != v]
    return Grid(
        nx=tuple(grid.nx[d] for d in keep),
        dx=tuple(grid.dx[d] for d in keep),
        x0=tuple(grid.x0[d] for d in keep),
        periodic=tuple(grid.periodic[d] for d in keep),
    )


def vertical_integral(field, grid: Grid, weight=None):
    """Sum over the vertical axis, optionally weighted (reference:
    UnmappedVertIntegral).  field lives on grid.shape (or a FC shape whose
    vertical extent matches); returns the flattened-grid array."""
    if weight is not None:
        field = field * weight
    return jnp.sum(field, axis=0) * grid.dx[grid.vertical_dir]


def vertical_mean(field, grid: Grid, weight=None):
    """Weighted vertical average per column."""
    if weight is None:
        return jnp.mean(field, axis=0)
    return jnp.sum(field * weight, axis=0) / jnp.sum(
        weight * jnp.ones_like(field), axis=0)


def extrude(flat_field, nz: int):
    """Broadcast a flattened-grid field back up the water column
    (reference: AddExtrusion kernel)."""
    return jnp.broadcast_to(flat_field[None, ...],
                            (nz,) + tuple(flat_field.shape))
