"""Volume-weighted norms, sums and integrals on mapped grids.

Re-design of the reference's computeMappedNorm / computeMappedSum
(`/root/reference/src/MappedChombo/computeMappedNorm.cpp` (1109 LoC),
`computeMappedSum.cpp` (944); kernels COMPUTEMAPPEDNORMPOW,
COMPUTEUNMAPPEDNORMPOW, COMPUTEMAPPED[FLUX]SUM[INV]): the physical-volume
integral of a cell-centered field is  sum_c f_c J_c dV_xi, with cells
covered by a finer level excluded from their own level's contribution
(composite hierarchy versions).  The reference's MPI allreduce becomes an
XLA reduction (sharded runs all-reduce automatically under pjit).

Accumulation runs in float32 regardless of the field dtype; XLA lowers
jnp.sum to a tree reduction, which keeps the error O(log n) ULPs — the
f32 stand-in for the reference's f64 accumulators (SURVEY.md §7 parity
note).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np


def _dv(geo) -> float:
    return float(np.prod(geo.grid.dx))


def mapped_sum(field, geo, mask=None):
    """Integral of a CC field over physical volume: sum f J dV
    (reference: computeMappedSum)."""
    w = geo.J * jnp.ones(geo.grid.shape)
    f = field.astype(jnp.float32) * w
    if mask is not None:
        f = jnp.where(mask, f, 0.0)
    return jnp.sum(f) * _dv(geo)


def mapped_norm(field, geo, p: int = 2, mask=None):
    """Volume-weighted p-norm: (sum |f|^p J dV)^(1/p); p=0 is the max
    norm (reference: computeMappedNorm, normType conventions)."""
    if p == 0:
        f = jnp.abs(field)
        if mask is not None:
            f = jnp.where(mask, f, 0.0)
        return jnp.max(f)
    w = geo.J * jnp.ones(geo.grid.shape)
    f = jnp.abs(field.astype(jnp.float32)) ** p * w
    if mask is not None:
        f = jnp.where(mask, f, 0.0)
    return jnp.sum(f * _dv(geo)) ** (1.0 / p)


def _covered_mask(grid, origin_axes, interior_shape_axes):
    """False inside the rectangle covered by a finer patch (dense analog
    of the reference's covered-region Mask, Mask.H:19)."""
    mask = jnp.ones(grid.shape, dtype=bool)
    idx = [jnp.arange(n) for n in grid.shape]
    cov = jnp.ones(grid.shape, dtype=bool)
    for ax, n in enumerate(grid.shape):
        lo = origin_axes[ax]
        hi = lo + interior_shape_axes[ax]
        in_ax = (idx[ax] >= lo) & (idx[ax] < hi)
        shape = [1] * len(grid.shape)
        shape[ax] = n
        cov = cov & in_ax.reshape(shape)
    return mask & ~cov


def composite_mapped_sum(hierarchy, fields: Sequence, origins) -> jnp.ndarray:
    """Hierarchy integral: each level contributes its UNCOVERED cells
    (reference: composite computeMappedSum over AMR levels).

    fields: one CC array per level, coarse to fine (a multi-patch level
    passes its (K,)+shape stack); origins: per-coupling traced origins.
    """
    return _composite(hierarchy, fields, origins, kind="sum")


def composite_mapped_norm(hierarchy, fields: Sequence, origins,
                          p: int = 2) -> jnp.ndarray:
    """Hierarchy p-norm with covered-region masking."""
    return _composite(hierarchy, fields, origins, kind="norm", p=p)


def _patch_geometry(c, k, origins, lev):
    org = origins[lev]
    if c.K > 1:
        org = org[k]
    grid_par = c.parent_grid
    ndim = grid_par.ndim
    int_start = tuple(c.halo if grid_par.dir_of_axis(ax) in c.cf_dirs
                      else 0 for ax in range(ndim))
    int_shape = tuple(c.interior_nx[grid_par.dir_of_axis(ax)]
                      for ax in range(ndim))
    origin_c = tuple((org[ax] + int_start[ax]) // c._axis_ratio(ax)
                     for ax in range(ndim))
    cov_shape = tuple(int_shape[ax] // c._axis_ratio(ax)
                      for ax in range(ndim))
    return int_start, int_shape, origin_c, cov_shape


def _composite(hierarchy, fields, origins, kind: str, p: int = 2):
    h = hierarchy
    total = jnp.zeros((), jnp.float32)
    mx = jnp.zeros((), jnp.float32)

    # level 0: mask cells covered by coupling 0's patch(es)
    levels = [h.level0] + [c.level for c in h.couplings]
    for lev in range(len(levels)):
        geo = levels[lev].geo
        grid = geo.grid
        if lev == 0:
            field = fields[0]
            patches = [(field, None)]
        else:
            c = h.couplings[lev - 1]
            if c.K > 1:
                patches = [( _index(fields[lev], k), k) for k in range(c.K)]
            else:
                patches = [(fields[lev], None)]
        for field, k in patches:
            mask = jnp.ones(grid.shape, dtype=bool)
            if lev > 0:
                # exclude this patch's own CF halo (not valid data)
                c = h.couplings[lev - 1]
                halo_axes = tuple(
                    c.halo if grid.dir_of_axis(ax) in c.cf_dirs else 0
                    for ax in range(grid.ndim))
                for ax, hh in enumerate(halo_axes):
                    if hh:
                        idx = jnp.arange(grid.shape[ax])
                        keep = (idx >= hh) & (idx < grid.shape[ax] - hh)
                        shape = [1] * grid.ndim
                        shape[ax] = grid.shape[ax]
                        mask = mask & keep.reshape(shape)
            if lev < len(h.couplings):
                # exclude cells covered by the next finer level's patches
                cf = h.couplings[lev]
                for kf in range(cf.K):
                    _, _, origin_c, cov_shape = _patch_geometry(
                        cf, kf, origins, lev)
                    mask = mask & _covered_mask(grid, origin_c, cov_shape)
            # multi-patch weight: inactive duplicate slots contribute 0
            w = 1.0
            if k is not None and h.couplings[lev - 1].weights is not None:
                w = float(h.couplings[lev - 1].weights[k])
            if w == 0.0:
                continue
            if kind == "sum":
                total = total + w * mapped_sum(field, geo, mask=mask)
            elif p == 0:
                mx = jnp.maximum(mx, mapped_norm(field, geo, 0, mask=mask))
            else:
                total = total + w * mapped_norm(field, geo, p,
                                                mask=mask) ** p
    if kind == "sum":
        return total
    if p == 0:
        return mx
    return total ** (1.0 / p)


def _index(stacked, k):
    return stacked[k]
