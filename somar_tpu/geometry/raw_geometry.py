"""Raw-coefficient geometries: LevelGeometry built from explicit arrays.

Used where an operator's coefficients are not derived from a coordinate
map: the leptic solver's flattened horizontal operator (vertically
integrated Jgup, reference LepticOperator.H / LepticBoxUtils) and any
variable-coefficient elliptic solve.  Coarse MG levels coarsen the arrays
directly (face coefficients: tangential block-average + normal subsample;
CC: block average), the standard coefficient-coarsening of operator-driven
multigrid.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from somar_tpu.core.grid import Grid
from somar_tpu.geometry.geo_source import GeoSource
from somar_tpu.geometry.level_geometry import LevelGeometry


class RawGeoSource(GeoSource):
    """Marker geo-source for array-defined geometries (no coordinate map)."""

    is_diagonal = True
    is_uniform = False
    name = "Raw"

    def phys_coor(self, mu, xi):
        return xi[mu]   # identity placeholder; metric comes from arrays


def raw_level_geometry(grid: Grid, J, Jgup_diag: Sequence,
                       dtype=jnp.float32) -> LevelGeometry:
    J = jnp.asarray(J, dtype) * jnp.ones(grid.shape, dtype)
    return LevelGeometry(
        grid, RawGeoSource(),
        J=J, Jinv=1.0 / J,
        Jgup_diag=tuple(jnp.asarray(g, dtype) * jnp.ones(grid.fc_shape(d), dtype)
                        for d, g in enumerate(Jgup_diag)),
        Jgup_full=None, e_cc=None, einv_cc=None, gdn_cc=None,
    )


def _block_mean_cc(arr, grid: Grid, ratio):
    shape = arr.shape
    new_shape = []
    for ax in range(len(shape)):
        r = ratio[grid.dir_of_axis(ax)]
        new_shape.extend([shape[ax] // r, r])
    return arr.reshape(new_shape).mean(axis=tuple(range(1, 2 * len(shape), 2)))


def _coarsen_fc(arr, grid: Grid, d: int, ratio):
    """Coarsen a face-centered coefficient: subsample coincident faces
    along the normal axis, block-average tangentially."""
    ax_n = grid.axis(d)
    # subsample normal faces at coarse positions
    sl = [slice(None)] * arr.ndim
    sl[ax_n] = slice(None, None, ratio[d])
    out = arr[tuple(sl)]
    # tangential block average
    shape = out.shape
    new_shape = []
    mean_axes = []
    pos = 0
    for ax in range(len(shape)):
        dd = grid.dir_of_axis(ax)
        if ax == ax_n:
            new_shape.append(shape[ax])
            pos += 1
        else:
            r = ratio[dd]
            new_shape.extend([shape[ax] // r, r])
            mean_axes.append(pos + 1)
            pos += 2
    return out.reshape(new_shape).mean(axis=tuple(mean_axes))


def coarsen_raw_geometry(geo: LevelGeometry, ratio) -> LevelGeometry:
    grid_c = geo.grid.coarsen(ratio)
    J_c = _block_mean_cc(geo.J * jnp.ones(geo.grid.shape), geo.grid, ratio)
    Jg_c = tuple(
        _coarsen_fc(geo.Jgup_diag[d] * jnp.ones(geo.grid.fc_shape(d)),
                    geo.grid, d, ratio)
        for d in range(geo.grid.ndim))
    return LevelGeometry(
        grid_c, geo.geo,
        J=J_c, Jinv=1.0 / J_c,
        Jgup_diag=Jg_c, Jgup_full=None, e_cc=None, einv_cc=None, gdn_cc=None,
    )
