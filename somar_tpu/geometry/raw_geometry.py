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
    """Marker geo-source for array-defined geometries (no coordinate map).

    Equality/hash by flags only: LevelGeometry pytrees carry the geo
    source as static aux data, and regrid rebuilds must not change the
    treedef (that would retrace the jitted step every regrid)."""

    is_uniform = False
    name = "Raw"

    def __init__(self, is_diagonal: bool = True):
        self.is_diagonal = is_diagonal

    def __eq__(self, other):
        return (type(other) is RawGeoSource
                and other.is_diagonal == self.is_diagonal)

    def __hash__(self):
        return hash(("RawGeoSource", self.is_diagonal))

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


def raw_from_level_geometry(lg: LevelGeometry,
                            grid: Grid = None) -> LevelGeometry:
    """Re-wrap a map-derived LevelGeometry as a raw (array-defined) one, so
    that downstream consumers (MG coefficient coarsening, the traced AMR
    metric path) treat the metric as data rather than re-evaluating the
    coordinate map.  Keeps the full metric (Jgup_full/e/einv/gdn) when
    present — the AMR patch of a terrain-following map is non-diagonal.

    `grid` optionally rebases onto a static index grid (same nx/dx but a
    placeholder x0): the moving AMR patch keeps ONE treedef across
    regrids, so the jitted step never recompiles as the patch moves."""
    if grid is None:
        grid = lg.grid
    assert grid.nx == lg.grid.nx and grid.dx == lg.grid.dx
    shape = grid.shape
    J = lg.J * jnp.ones(shape)
    return LevelGeometry(
        grid, RawGeoSource(is_diagonal=lg.is_diagonal),
        J=J, Jinv=1.0 / J,
        Jgup_diag=tuple(lg.Jgup_diag[d] * jnp.ones(grid.fc_shape(d))
                        for d in range(grid.ndim)),
        Jgup_full=lg.Jgup_full, e_cc=lg.e_cc, einv_cc=lg.einv_cc,
        gdn_cc=lg.gdn_cc,
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
    grid = geo.grid
    grid_c = grid.coarsen(ratio)
    ndim = grid.ndim
    J_c = _block_mean_cc(geo.J * jnp.ones(grid.shape), grid, ratio)
    Jg_c = tuple(
        _coarsen_fc(geo.Jgup_diag[d] * jnp.ones(grid.fc_shape(d)),
                    grid, d, ratio)
        for d in range(ndim))
    Jg_full_c = None
    if geo.Jgup_full is not None:
        Jg_full_c = tuple(
            jnp.stack([_coarsen_fc(geo.Jgup_full[d][j], grid, d, ratio)
                       for j in range(ndim)])
            for d in range(ndim))

    def cc_tensor(t):
        if t is None:
            return None
        rows = [[_block_mean_cc(t[i, j], grid, ratio) for j in range(ndim)]
                for i in range(ndim)]
        return jnp.stack([jnp.stack(r) for r in rows])

    return LevelGeometry(
        grid_c, geo.geo,
        J=J_c, Jinv=1.0 / J_c,
        Jgup_diag=Jg_c, Jgup_full=Jg_full_c,
        e_cc=cc_tensor(geo.e_cc), einv_cc=cc_tensor(geo.einv_cc),
        gdn_cc=cc_tensor(geo.gdn_cc),
    )
