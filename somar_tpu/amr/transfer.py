"""Inter-level transfer operators: prolongation, restriction, patch moves.

Re-design of the reference's MappedChombo transfer layer
(`/root/reference/src/MappedChombo/`): MappedCoarseAverage (fine->coarse
block averaging, MappedCoarseAverageF.ChF), MappedFineInterp
(coarse->fine piecewise-linear, MappedFineInterpF.ChF),
MappedPiecewiseLinearFillPatch (space+time interpolated CF ghost fill).
All support anisotropic per-direction IntVect ratios.

Dense-array versions: prolongation is slope-based (central differences,
one-sided at edges) evaluated at the fine-cell offsets inside each coarse
cell; restriction is block averaging; patch extraction/insertion are
dynamic slices at traced origins (regrid moves the patch without
recompiling).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from somar_tpu.core.grid import Grid
from somar_tpu.solvers.multigrid import restrict_fullweight


def _slopes(arr, ax: int):
    """Van-Leer-limited central slopes per cell, one-sided at the edges
    (reference: MappedFineInterp's limited-linear variant,
    UnmappedInterpLimitFace — unlimited central slopes overshoot ~25% at
    sharp interfaces, which the lock-exchange front immediately exposes)."""
    n = arr.shape[ax]
    sl = lambda a, b: jax.lax.slice_in_dim(arr, a, b, axis=ax)
    dl = sl(1, n - 1) - sl(0, n - 2)
    dr = sl(2, n) - sl(1, n - 1)
    dc = 0.5 * (dl + dr)
    lim = 2.0 * jnp.minimum(jnp.abs(dl), jnp.abs(dr))
    mono = (dl * dr) > 0.0
    interior = jnp.where(mono, jnp.sign(dc) * jnp.minimum(jnp.abs(dc), lim),
                         0.0)
    lo = sl(1, 2) - sl(0, 1)
    hi = sl(n - 1, n) - sl(n - 2, n - 1)
    return jnp.concatenate([lo, interior, hi], axis=ax)


def prolong_linear(coarse, grid_c: Grid, ratio: Sequence[int]):
    """Piecewise-multilinear interpolation onto the refined grid
    (reference: MappedFineInterp unmappedinterplinear)."""
    out = coarse
    ndim = coarse.ndim
    for ax in range(ndim):
        d = grid_c.dir_of_axis(ax)
        r = ratio[d]
        if r == 1:
            continue
        s = _slopes(out, ax)
        # fine sub-cell offsets within a coarse cell: ((k+0.5)/r - 0.5)
        offsets = (jnp.arange(r) + 0.5) / r - 0.5
        # expand: out[..., i, ...] -> out + offset_k * slope
        oshape = [1] * (out.ndim + 1)
        oshape[ax + 1] = r
        off = offsets.reshape(oshape)
        vals = jnp.expand_dims(out, ax + 1) + off * jnp.expand_dims(s, ax + 1)
        merged = list(out.shape)
        merged[ax] = merged[ax] * r
        out = vals.reshape(merged)
    return out


def prolong_quadratic(coarse, grid_c: Grid, ratio: Sequence[int]):
    """Piecewise-parabolic (unlimited) interpolation onto the refined grid.

    Quadratic-accuracy coarse->fine values for SMOOTH fields — the elliptic
    ghost-potential rings (reference: MappedQuadCFInterp, the quadratic
    coarse-fine interpolation used by the elliptic operators,
    `/root/reference/src/MappedChombo/MappedQuadCFInterp.H:21`, kernels
    MAPPEDPHISTAR/mappedquadinterp).  Per axis the parabola through three
    coarse cells is evaluated at the fine sub-cell offsets:
    f(off) = f0 + off*s1 + off^2/2 * s2 with s1 the central difference and
    s2 the second difference; one-sided parabolas at the edges.  O(h^3)
    pointwise, one order better than `prolong_linear` — exactly what the
    CF Dirichlet ghost data of a 2nd-order operator needs to avoid
    dominating the solution error at the interface.
    """
    out = coarse
    ndim = coarse.ndim
    for ax in range(ndim):
        d = grid_c.dir_of_axis(ax)
        r = ratio[d]
        if r == 1:
            continue
        n = out.shape[ax]
        sl = lambda a, b: jax.lax.slice_in_dim(out, a, b, axis=ax)
        if n >= 3:
            dl = sl(1, n - 1) - sl(0, n - 2)
            dr = sl(2, n) - sl(1, n - 1)
            s1_int = 0.5 * (dl + dr)
            s2_int = dr - dl
            # one-sided second-order slopes at the edges from the adjacent
            # interior parabola (constant extrapolation of s2)
            s1_lo = jax.lax.slice_in_dim(s1_int, 0, 1, axis=ax) - \
                jax.lax.slice_in_dim(s2_int, 0, 1, axis=ax)
            s1_hi = jax.lax.slice_in_dim(s1_int, n - 3, n - 2, axis=ax) + \
                jax.lax.slice_in_dim(s2_int, n - 3, n - 2, axis=ax)
            s2_lo = jax.lax.slice_in_dim(s2_int, 0, 1, axis=ax)
            s2_hi = jax.lax.slice_in_dim(s2_int, n - 3, n - 2, axis=ax)
            s1 = jnp.concatenate([s1_lo, s1_int, s1_hi], axis=ax)
            s2 = jnp.concatenate([s2_lo, s2_int, s2_hi], axis=ax)
        elif n == 2:
            s1 = sl(1, 2) - sl(0, 1)
            s1 = jnp.concatenate([s1, s1], axis=ax)
            s2 = jnp.zeros_like(out)
        else:
            s1 = jnp.zeros_like(out)
            s2 = jnp.zeros_like(out)
        offsets = (jnp.arange(r) + 0.5) / r - 0.5
        oshape = [1] * (out.ndim + 1)
        oshape[ax + 1] = r
        off = offsets.reshape(oshape)
        vals = (jnp.expand_dims(out, ax + 1)
                + off * jnp.expand_dims(s1, ax + 1)
                + 0.5 * off * off * jnp.expand_dims(s2, ax + 1))
        merged = list(out.shape)
        merged[ax] = merged[ax] * r
        out = vals.reshape(merged)
    return out


def restrict_average(fine, grid_f: Grid, ratio: Sequence[int]):
    """Fine->coarse block average (reference: MappedCoarseAverage
    UNMAPPEDAVERAGE)."""
    return restrict_fullweight(fine, grid_f, ratio)


def restrict_average_fc(fine_fc, d: int, grid_f: Grid, ratio: Sequence[int],
                        harmonic: bool = False):
    """Fine->coarse averaging of a FACE-centered (d-normal) field
    (reference: MappedCoarseAverageFace, kernels UNMAPPEDAVERAGEFACE /
    UNMAPPEDAVERAGEFACEHARMONIC): coarse faces coincide with every
    ratio[d]-th fine face plane; the coarse value is the TANGENTIAL block
    mean of that plane (arithmetic or harmonic)."""
    ndim = fine_fc.ndim
    ax_n = grid_f.axis(d)
    r_n = ratio[d]
    # subsample the coincident fine face planes along the normal
    sl = [slice(None)] * ndim
    sl[ax_n] = slice(0, None, r_n)
    out = fine_fc[tuple(sl)]
    if harmonic:
        out = 1.0 / out
    # tangential block mean
    resh = []
    mean_axes = []
    for ax in range(ndim):
        dd = grid_f.dir_of_axis(ax)
        if ax == ax_n:
            resh.append(out.shape[ax])
        else:
            r = ratio[dd]
            resh.extend([out.shape[ax] // r, r])
            mean_axes.append(len(resh) - 1)
    out = out.reshape(resh).mean(axis=tuple(mean_axes))
    if harmonic:
        out = 1.0 / out
    return out


def prolong_linear_fc(coarse_fc, d: int, grid_c: Grid,
                      ratio: Sequence[int]):
    """Coarse->fine interpolation of a FACE-centered (d-normal) field
    (reference: MappedFineInterpFace, UnmappedInterpLinearFace): linear
    along the normal between coincident coarse faces, slope-limited
    linear in the tangential directions (per-face prolongation of the
    tangential profile)."""
    ndim = coarse_fc.ndim
    ax_n = grid_c.axis(d)
    r_n = ratio[d]
    out = coarse_fc
    # normal direction: fine faces between coincident coarse faces f, f+1
    # at fractions k/r  (k = 0..r-1), plus the final coincident face
    if r_n > 1:
        n = out.shape[ax_n]
        lo = jax.lax.slice_in_dim(out, 0, n - 1, axis=ax_n)
        hi = jax.lax.slice_in_dim(out, 1, n, axis=ax_n)
        fracs = jnp.arange(r_n) / r_n
        oshape = [1] * (out.ndim + 1)
        oshape[ax_n + 1] = r_n
        f = fracs.reshape(oshape)
        vals = (jnp.expand_dims(lo, ax_n + 1) * (1.0 - f)
                + jnp.expand_dims(hi, ax_n + 1) * f)
        merged = list(out.shape)
        merged[ax_n] = (n - 1) * r_n
        vals = vals.reshape(merged)
        last = jax.lax.slice_in_dim(out, n - 1, n, axis=ax_n)
        out = jnp.concatenate([vals, last], axis=ax_n)
    # tangential directions: limited-linear within each coarse cell
    for ax in range(ndim):
        if ax == ax_n:
            continue
        dd = grid_c.dir_of_axis(ax)
        r = ratio[dd]
        if r == 1:
            continue
        s = _slopes(out, ax)
        offsets = (jnp.arange(r) + 0.5) / r - 0.5
        oshape = [1] * (out.ndim + 1)
        oshape[ax + 1] = r
        off = offsets.reshape(oshape)
        vals = jnp.expand_dims(out, ax + 1) + off * jnp.expand_dims(s, ax + 1)
        merged = list(out.shape)
        merged[ax] = merged[ax] * r
        out = vals.reshape(merged)
    return out


def extract_patch(field, origin_axes, shape_axes):
    """dynamic_slice of a rectangular patch; origin per ARRAY axis (may be
    traced), shape static."""
    return jax.lax.dynamic_slice(field, tuple(origin_axes),
                                 tuple(shape_axes))


def insert_patch(field, patch, origin_axes):
    """dynamic_update_slice of a rectangular patch at a (traced) origin."""
    return jax.lax.dynamic_update_slice(field, patch.astype(field.dtype),
                                        tuple(origin_axes))


def time_interp(old, new, frac):
    """Linear time interpolation between coarse states (reference:
    MappedPiecewiseLinearFillPatch time interpolation)."""
    return jax.tree_util.tree_map(
        lambda a, b: (1.0 - frac) * a + frac * b, old, new)
