"""Refinement tagging: where to refine.

Re-design of AMRNavierStokes::tagCells
(`/root/reference/src/NavierStokes/AMRNavierStokesRegrid.cpp:85-677`):
  * undivided-difference tags on buoyancy / velocity (tolerance knobs
    amr.buoyancy_tag_tol, amr.vel_tag_tol);
  * |vorticity| quota tags (fraction of the level max, amr.magvort_tag_quota,
    :255-330);
  * gradient-Richardson-number tags (:234-252);
  * tag growing (amr.tags_grow) and vertical tag extrusion
    (s_vert_extrude_tags, AMRNavierStokes.H:745-749 — levels span the
    water column, which the single-patch TPU hierarchy requires anyway).

Runs host-side at regrid time on NumPy copies (regridding changes array
shapes/origins, so it is inherently un-jitted — same as the reference).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from somar_tpu.core.grid import Grid


@dataclasses.dataclass(frozen=True)
class TagParams:
    buoyancy_tag_tol: float = 0.0
    vel_tag_tol: float = 0.0
    magvort_tag_quota: float = 0.0
    pressure_tag_tol: float = 0.0   # amr.pressure_tag_tol
    #: amr.do_Ri_tagging / amr.Ri_tag_tol: tag cells with gradient
    #: Richardson number <= tol (shear instability; reference:
    #: AMRNavierStokesRegrid.cpp:233-252)
    do_ri_tagging: bool = False
    ri_tag_tol: float = 0.25
    #: per-component absolute |vorticity| thresholds (amr.vort_tag_tol;
    #: 2D uses component z = index 2, Regrid.cpp:334-373)
    vort_tag_tol: tuple = (0.0, 0.0, 0.0)
    tags_grow: int = 0
    vert_extrude: bool = True
    #: Berger-Rigoutsos knobs (amr.fill_ratio / amr.block_factor)
    fill_ratio: float = 0.8
    block_factor: int = 8


def _undivided_diff_mag(f: np.ndarray) -> np.ndarray:
    """Max undivided one-sided difference magnitude over all axes."""
    out = np.zeros_like(f)
    for ax in range(f.ndim):
        d = np.abs(np.diff(f, axis=ax))
        lo = [slice(None)] * f.ndim
        hi = [slice(None)] * f.ndim
        lo[ax] = slice(0, -1)
        hi[ax] = slice(1, None)
        np.maximum(out[tuple(lo)], d, out=out[tuple(lo)])
        np.maximum(out[tuple(hi)], d, out=out[tuple(hi)])
    return out


def compute_tags(state, level, params: TagParams) -> np.ndarray:
    """Boolean tag field on the level's grid (host-side)."""
    grid: Grid = level.grid
    tags = np.zeros(grid.shape, dtype=bool)

    if params.buoyancy_tag_tol > 0.0:
        b = np.asarray(state.scalars[0])
        tags |= _undivided_diff_mag(b) > params.buoyancy_tag_tol

    if params.vel_tag_tol > 0.0:
        for m in range(grid.ndim):
            u = np.asarray(state.vel[m])
            tags |= _undivided_diff_mag(u) > params.vel_tag_tol

    if params.pressure_tag_tol > 0.0:
        # undivided differences of the lagged CC pressure (reference:
        # AMRNavierStokesRegrid.cpp:527-585)
        pres = np.asarray(state.pressure)
        tags |= _undivided_diff_mag(pres) > params.pressure_tag_tol

    if params.do_ri_tagging:
        # tag where Ri = N^2_local/S^2 <= tol (reference tags Ri below
        # the instability threshold, Regrid.cpp:233-252)
        from somar_tpu.physics.derived import compute_ri_number
        ri = np.asarray(compute_ri_number(level, state))
        tags |= ri <= params.ri_tag_tol

    use_vort_tol = any(t > 0.0 for t in params.vort_tag_tol)
    if params.magvort_tag_quota > 0.0 or use_vort_tol:
        from somar_tpu.ops.stencil import vorticity
        w = np.asarray(vorticity(
            state.vel, level.geo,
            [level.vel_bcs_trace[m] for m in range(grid.ndim)]))
        mag = np.abs(w) if grid.ndim == 2 else np.sqrt((w**2).sum(axis=0))
        if params.magvort_tag_quota > 0.0:
            mmax = mag.max()
            if mmax > 0:
                tags |= mag > params.magvort_tag_quota * mmax
        if use_vort_tol:
            # absolute per-component thresholds (reference: vort_tag_tol;
            # the 2D scalar vorticity is the z component)
            tol = params.vort_tag_tol
            if grid.ndim == 2:
                if tol[2] > 0.0:
                    tags |= np.abs(w) >= tol[2]
            else:
                for c in range(3):
                    if tol[c] > 0.0:
                        tags |= np.abs(w[c]) >= tol[c]

    if params.tags_grow > 0 and tags.any():
        g = params.tags_grow
        grown = tags.copy()
        for ax in range(tags.ndim):
            for shift in range(1, g + 1):
                grown |= np.roll(tags, shift, axis=ax)
                grown |= np.roll(tags, -shift, axis=ax)
        tags = grown

    if params.vert_extrude and tags.any():
        # extrude along the vertical (array axis 0): a tagged column is
        # tagged everywhere (reference: s_vert_extrude_tags)
        tags = np.broadcast_to(tags.any(axis=0, keepdims=True),
                               tags.shape).copy()
    return tags


def patch_origins_from_tags(tags: np.ndarray, grid: Grid, ratio,
                            interior_shape_f, halo_axes, num_patches: int,
                            lo_pad_f=None, fill_ratio: float = 0.8,
                            block_factor: int = 8):
    """Choose up to `num_patches` well-separated patch origins covering
    the tag clusters (multi-box levels; reference: LepticMeshRefine
    returns Berger-Rigoutsos box lists, `LepticMeshRefine.H:63-80`).

    Each patch has the SAME static fine interior shape; clusters closer
    than the patch footprint merge into one patch (separation guarantees
    every patch's CF halo sees only parent data — no fine-fine sibling
    ghost exchange).  Returns (origins (K, ndim) int64, weights (K,)
    float32) with weight 0 marking inactive duplicate slots, or None when
    nothing is tagged.
    """
    from somar_tpu.native import berger_rigoutsos

    if not tags.any():
        return None
    if lo_pad_f is None:
        lo_pad_f = (0,) * grid.ndim
    K = int(num_patches)
    boxes = np.asarray(berger_rigoutsos(
        tags, fill_ratio=fill_ratio,
        min_side=max(1, int(block_factor) // 2)))  # (n, 2, ndim), hi incl.
    if boxes.ndim != 3 or len(boxes) == 0:
        boxes = np.stack([np.stack([np.zeros(grid.ndim, np.int64),
                                    np.asarray(tags.shape) - 1])])
    # group clusters: sort by CF-axis interval, then greedily merge any
    # two groups whose bounding boxes would land on overlapping patches
    cf_axes = [ax for ax in range(grid.ndim) if halo_axes[ax] > 0]
    groups = [b.astype(np.int64) for b in boxes]

    def origin_of(bbox):
        lo, hi = bbox[0], bbox[1]
        origin = np.zeros(grid.ndim, dtype=np.int64)
        for ax in range(grid.ndim):
            d = grid.dir_of_axis(ax)
            r = ratio[d]
            n_f = grid.nx[d] * r
            interior_f = interior_shape_f[ax]
            h = halo_axes[ax]
            center_c = 0.5 * (lo[ax] + hi[ax] + 1)
            start_f = int(round(center_c * r - interior_f / 2))
            start_f = (start_f // r) * r
            margin = h + r + lo_pad_f[ax] if h > 0 else 0
            start_f = max(margin, min(start_f, n_f - interior_f - margin))
            origin[ax] = start_f - h
        return origin

    def merged(a, b):
        return np.stack([np.minimum(a[0], b[0]), np.maximum(a[1], b[1])])

    def patches_overlap(oa, ob):
        """Extended patches (plus one parent cell of donor margin) must be
        disjoint along at least one CF axis."""
        for ax in cf_axes:
            d = grid.dir_of_axis(ax)
            r = ratio[d]
            ext_f = (interior_shape_f[ax] + 2 * halo_axes[ax])
            lo_a, hi_a = oa[ax] - r, oa[ax] + ext_f + r
            lo_b, hi_b = ob[ax] - r, ob[ax] + ext_f + r
            if hi_a <= lo_b or hi_b <= lo_a:
                return False
        return len(cf_axes) > 0

    # merge until the chosen origins are pairwise separated and <= K
    while True:
        # largest-first keeps the dominant clusters distinct
        groups.sort(key=lambda b: -int(np.prod(b[1] - b[0] + 1)))
        while len(groups) > K:
            # merge the pair with the smallest gap along the CF axes
            best = (None, np.inf)
            for i in range(len(groups)):
                for j in range(i + 1, len(groups)):
                    gap = 0
                    for ax in cf_axes:
                        gap += max(0, max(groups[i][0][ax]
                                          - groups[j][1][ax] - 1,
                                          groups[j][0][ax]
                                          - groups[i][1][ax] - 1))
                    if gap < best[1]:
                        best = ((i, j), gap)
            (i, j), _ = best
            groups[i] = merged(groups[i], groups[j])
            del groups[j]
        origins = [origin_of(b) for b in groups]
        collided = False
        for i in range(len(origins)):
            for j in range(i + 1, len(origins)):
                if patches_overlap(origins[i], origins[j]):
                    groups[i] = merged(groups[i], groups[j])
                    del groups[j]
                    collided = True
                    break
            if collided:
                break
        if not collided:
            break

    n = len(origins)
    out = np.zeros((K, grid.ndim), dtype=np.int64)
    w = np.zeros(K, dtype=np.float32)
    for k in range(K):
        out[k] = origins[k if k < n else 0]
        w[k] = 1.0 if k < n else 0.0
    return out, w


def tag_coverage(tags: np.ndarray, origins, weights, grid: Grid, ratio,
                 interior_shape_f, halo_axes):
    """(n_dropped, n_tagged): tagged parent cells NOT covered by any
    active patch interior.  The reference's Berger-Rigoutsos boxes cover
    every tag by construction (LepticMeshRefine::makeBoxes); the static-
    shape patch model cannot always — this makes under-coverage a
    DETECTED, reported event instead of a silent accuracy loss."""
    origins = np.atleast_2d(np.asarray(origins, dtype=np.int64))
    covered = np.zeros_like(tags)
    for k in range(origins.shape[0]):
        if weights is not None and float(np.asarray(weights)[k]) == 0.0:
            continue
        sl = []
        for ax in range(tags.ndim):
            r = ratio[grid.dir_of_axis(ax)]
            start_c = (int(origins[k, ax]) + halo_axes[ax]) // r
            size_c = max(1, interior_shape_f[ax] // r)
            sl.append(slice(max(0, start_c),
                            min(tags.shape[ax], start_c + size_c)))
        covered[tuple(sl)] = True
    n_tagged = int(tags.sum())
    n_dropped = int((tags & ~covered).sum())
    return n_dropped, n_tagged


def patch_origin_from_tags(tags: np.ndarray, grid: Grid, ratio,
                           interior_shape_f, halo_axes,
                           lo_pad_f=None) -> Optional[np.ndarray]:
    """Choose the (fine-index-space) patch origin covering the tags.

    The patch has a STATIC fine interior shape per array axis
    (interior_shape_f) and a per-axis halo (0 on physical/vertical sides,
    ADVECT_GROW on coarse-fine sides); the origin snaps to coarse cells and
    is clamped so patch+halo stays inside the domain.  `lo_pad_f` adds a
    per-axis no-go margin in fine cells at BOTH ends (the parent level's
    own CF halo for nested hierarchies).  Returns the per-array-axis
    origin of the EXTENDED patch, or None when untagged.
    """
    from somar_tpu.native import tag_bounding_box

    bbox = tag_bounding_box(tags)
    if bbox is None:
        return None
    if lo_pad_f is None:
        lo_pad_f = (0,) * grid.ndim
    lo, hi = bbox[0], bbox[1]
    origin = np.zeros(grid.ndim, dtype=np.int64)  # per array axis, fine cells
    for ax in range(grid.ndim):
        d = grid.dir_of_axis(ax)
        r = ratio[d]
        n_f = grid.nx[d] * r
        interior_f = interior_shape_f[ax]
        h = halo_axes[ax]
        center_c = 0.5 * (lo[ax] + hi[ax] + 1)
        start_f = int(round(center_c * r - interior_f / 2))
        start_f = (start_f // r) * r                 # snap to coarse cells
        # clamp keeping one coarse cell of donor margin beyond the halo on
        # CF sides (h > 0); spanned sides (h == 0) pin to the boundary
        margin = h + r + lo_pad_f[ax] if h > 0 else 0
        start_f = max(margin, min(start_f, n_f - interior_f - margin))
        origin[ax] = start_f - h                     # extended origin
    return origin
