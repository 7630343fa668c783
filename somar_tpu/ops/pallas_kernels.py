"""Pallas TPU kernels for the hot stencil ops.

The Godunov CTU predictor is the step's bandwidth hog (5+ traced fields x
3 directions per step).  Left to XLA, the stage-2/3 transverse-correction
DAG materializes ~40 padded (136,136,520)-size temporaries per trace and
fuses the rest BY DUPLICATION (every shift/identity diamond doubles the
recompute) — measured ~15 ms/trace at 512x128x128 on v5e vs ~1.5 ms for
the kernelized pipeline below.

Two kernel rounds, each with stencils along exactly ONE axis so blocks
never need halos (full extent along the stencil axis, tiles elsewhere):

  P1  `ppm_predict_pallas`  (per direction d, stencil along d):
      the fused PPM normal predictor — 4th-order face interpolation,
      CW84 limiting, characteristic tracing — emitting the face-indexed
      (lo, hi) states, the stage-1 Riemann state rie, and the shared
      transverse correction  corr2 = -coef * u * d(rie)/dxi
      (coef = dt/3 for the 3D CTU stage 2, dt/2 for the 2D stage 3).
      Reference kernels: PPMFaceValuesF / PPMLimiterF / PPMNormalPredF /
      RiemannSolver (MappedGodunovUtilitiesF.ChF, AdvectUtilF.ChF).

  P2  `ctu_corr3_pallas`  (per direction j, stencil along j):
      the 3D stage-2+3 cross terms — for each transverse partner k:
      rie2 = Riemann(lo1_j + corr2_k, hi1_j + shift(corr2_k), vbar_j),
      corr3_(j,k) = -(dt/2) u_j * d(rie2)/dxi_j.
      Reference: the transverse (quasilinear) update QuasilinearUpdateF.

All arrays are "face-indexed" full padded shape (entry f = face between
cells f and f+1, tail entry junk — see godunov.py).  The final stage-3
assembly (sums + one shift along d + Riemann against the advecting
velocity) stays in XLA behind an optimization_barrier: it is shallow, so
fusion-by-duplication cannot blow it up.

Equivalent jnp reference: somar_tpu/physics/godunov.py (the use_pallas
= False path); parity is asserted in tests with interpret=True on CPU.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: per-block VMEM byte budget for the stencil-kernel blocking (module-level
#: so tests can shrink it to exercise the lane-padded fallback paths;
#: SOMAR_VMEM_BUDGET overrides for per-chip tuning)
import os as _os
_VMEM_BUDGET = int(_os.environ.get("SOMAR_VMEM_BUDGET", 640 * 1024))


# --------------------------------------------------------------------------
# shared blocking planner: full extent along the stencil axis, tile the
# other axes down to a VMEM budget; if that fails and the stencil is not
# along lanes, pad the lane axis to a multiple of 128 and tile it.
# --------------------------------------------------------------------------
def _plan_blocking(shape: Tuple[int, ...], ax: int):
    """Returns (block, grid, index_map) or None if infeasible.

    Full extent along the stencil axis ax; tile the other axes under the
    VMEM budget.  When the stencil is not along lanes, the lane axis may
    be tiled with a NON-DIVIDING block (grid = cdiv): Pallas masks the
    partial tail block, so no edge-padding of the inputs is needed (the
    pad/crop pairs cost ~8 ms/step at 512x128x128 before this)."""
    ndim = len(shape)
    budget = _VMEM_BUDGET

    def divisors_desc(n, multiple=1):
        return [d for d in range(n, 0, -1)
                if n % d == 0 and d % multiple == 0]

    def bytes_of(blk):
        # budget with the TILE-PADDED footprint: Mosaic rounds the lane
        # dim up to 128 and the sublane dim up to 8 (e.g. a 264-lane
        # block occupies 384 lanes of VMEM — 1.45x the logical bytes;
        # budgeting logical bytes OOMs the 16 MB scoped vmem at odd
        # domain sizes)
        b = 4
        for i, v in enumerate(blk):
            if i == ndim - 1:
                v = ((v + 127) // 128) * 128
            elif i == ndim - 2:
                v = ((v + 7) // 8) * 8
            b *= v
        return b

    def try_blocking(shp, tile_lanes: bool):
        blk = list(shp)
        axes = [a for a in range(ndim) if a != ax and a != ndim - 1]
        if tile_lanes and ax != ndim - 1:
            axes.append(ndim - 1)   # lanes last: prefer sublane tiling
        for a in axes:
            if bytes_of(blk) <= budget:
                break
            if a == ndim - 1:
                # lanes: 128-multiple blocks, allow a masked partial tail
                for d in range(((shp[a] + 127) // 128) * 128, 0, -128):
                    blk[a] = d
                    if bytes_of(blk) <= budget:
                        break
            else:
                mult = 8 if a == ndim - 2 else 1
                for d in divisors_desc(shp[a], mult):
                    blk[a] = d
                    if bytes_of(blk) <= budget:
                        break
        return blk if bytes_of(blk) <= budget else None

    block = try_blocking(shape, tile_lanes=False)
    if block is None and ax != ndim - 1:
        block = try_blocking(shape, tile_lanes=True)
    if block is None:
        return None

    def cdiv(a, b):
        return -(-a // b)

    tile_axes = [a for a in range(ndim) if a != ax]
    grid_axes = [a for a in tile_axes if cdiv(shape[a], block[a]) > 1]
    grid = tuple(cdiv(shape[a], block[a]) for a in grid_axes)
    return tuple(block), grid, tuple(grid_axes)


def _spec_for(arr_shape, block, grid_axes, ndim, full_shape=None):
    """BlockSpec for an input/output of the planned blocking.  Arrays with
    a length-1 LEADING axis narrower than the planned (batched) lead
    extent are lead-broadcast (shared across the batch): they get a
    lead-1 block PINNED to block index 0 — without the pin, a lead grid
    axis would index past the length-1 array (runtime abort)."""
    lead_full = full_shape[0] if full_shape is not None else block[0]
    lead_bcast = (len(arr_shape) == ndim and arr_shape[0] == 1
                  and lead_full != 1)
    blk = (1,) + tuple(block[1:]) if lead_bcast else tuple(block)

    def imap(*gidx):
        idx = [0] * ndim
        for g, a in zip(gidx, grid_axes):
            idx[a] = g
        if lead_bcast:
            idx[0] = 0
        return tuple(idx)

    return pl.BlockSpec(blk, imap if grid_axes else None)


# --------------------------------------------------------------------------
# in-kernel helpers (operate on full-extent stencil axis inside a block)
# --------------------------------------------------------------------------
def _sh(arr, ax, lo, size):
    idx = [slice(None)] * arr.ndim
    idx[ax] = slice(lo, lo + size)
    return arr[tuple(idx)]


def _kshift_p(arr, ax):
    """out[i] = arr[i+1]; edge junk at the last entry."""
    n = arr.shape[ax]
    return jnp.concatenate([_sh(arr, ax, 1, n - 1), _sh(arr, ax, n - 1, 1)],
                           axis=ax)


def _kshift_m(arr, ax):
    """out[i] = arr[i-1]; edge junk at the first entry."""
    n = arr.shape[ax]
    return jnp.concatenate([_sh(arr, ax, 0, 1), _sh(arr, ax, 0, n - 1)],
                           axis=ax)


def _kriemann(lo, hi, vf):
    avg = 0.5 * (lo + hi)
    return jnp.where(vf > 1e-12, lo, jnp.where(vf < -1e-12, hi, avg))


# --------------------------------------------------------------------------
# P1: fused PPM stage-1 predictor (+ shared transverse correction)
# --------------------------------------------------------------------------
def _ppm_kernel(sp_ref, up_ref, scal_ref, lo_ref, hi_ref,
                corr_ref, *, ax: int, use_limiting: bool):
    """One fused PPM stage-1 pass along array axis `ax` of the block.
    scal_ref holds [dt/dx, corr_coef/dx] in SMEM."""
    s = sp_ref[...]
    u = up_ref[...]
    dtdx = scal_ref[0]
    corr_coef = scal_ref[1]

    n = s.shape[ax]

    # cells 2..n-2 are PPM-computable (need +-2); emit on cells [2, n-2)
    m = n - 4
    c_m2 = _sh(s, ax, 0, m)
    c_m1 = _sh(s, ax, 1, m)
    c_0 = _sh(s, ax, 2, m)
    c_p1 = _sh(s, ax, 3, m)
    c_p2 = _sh(s, ax, 4, m)
    u_0 = _sh(u, ax, 2, m)
    nu = u_0 * dtdx

    # 4th-order face interpolants (reference: PPMFaceValuesF)
    sR = (7.0 / 12.0) * (c_0 + c_p1) - (1.0 / 12.0) * (c_m1 + c_p2)
    sL = (7.0 / 12.0) * (c_m1 + c_0) - (1.0 / 12.0) * (c_m2 + c_p1)

    if use_limiting:  # CW84 monotonization (reference: PPMLimiterF)
        flat = (sR - c_0) * (c_0 - sL) <= 0.0
        dsum0 = sR - sL
        s6t = 6.0 * (c_0 - 0.5 * (sL + sR))
        cond_l = dsum0 * s6t > dsum0 * dsum0
        cond_r = -dsum0 * dsum0 > dsum0 * s6t
        sLn = jnp.where(flat, c_0, jnp.where(cond_l, 3.0 * c_0 - 2.0 * sR, sL))
        sRn = jnp.where(flat, c_0, jnp.where(cond_r, 3.0 * c_0 - 2.0 * sL, sR))
        sL, sR = sLn, sRn

    dsum = sR - sL
    s6 = 6.0 * (c_0 - 0.5 * (sL + sR))
    sig_p = jnp.maximum(nu, 0.0)
    sig_m = jnp.maximum(-nu, 0.0)
    splus = sR - 0.5 * sig_p * (dsum - (1.0 - (2.0 / 3.0) * sig_p) * s6)
    sminus = sL + 0.5 * sig_m * (dsum + (1.0 - (2.0 / 3.0) * sig_m) * s6)

    # edge-pad back to n cells along ax (ghost junk, cropped downstream),
    # matching _normal_predict_fullpad's jnp.pad(..., mode="edge")
    def edge_pad(arr):
        first = _sh(arr, ax, 0, 1)
        last = _sh(arr, ax, m - 1, 1)
        return jnp.concatenate(
            [jnp.concatenate([first, first], axis=ax), arr,
             jnp.concatenate([last, last], axis=ax)], axis=ax)

    splus = edge_pad(splus)    # length n
    sminus = edge_pad(sminus)

    # face-indexed outputs, full length n: entry f = face between cells
    # f | f+1; lo from the left cell f, hi from the right cell f+1
    lo = splus
    hi = _kshift_p(sminus, ax)
    lo_ref[...] = lo
    hi_ref[...] = hi

    # stage-1 Riemann with the face-averaged tracing velocity (internal
    # only — the rie states feed the shared transverse correction and are
    # never consumed downstream, so emitting them would waste a full
    # padded-array HBM write per trace direction)
    vf = 0.5 * (u + _kshift_p(u, ax))
    rie = _kriemann(lo, hi, vf)

    # shared transverse correction: -coef * u * d(rie)/dxi at cells
    corr_ref[...] = -corr_coef * u * (rie - _kshift_m(rie, ax))


def ppm_predict_pallas(sp, up, dt_over_dx, ax: int, use_limiting: bool,
                       corr_coef_over_dx=0.0, interpret: bool = False):
    """Fused PPM stage-1 for one direction on a padded array.

    sp, up: padded scalar / tracing velocity (same shape).
    corr_coef_over_dx: coefficient/dx of the emitted transverse correction
    (dt/3/dx for the 3D stage 2, dt/2/dx for the 2D stage 3).
    Returns (lo, hi, corr2) face-indexed arrays of the SAME shape as
    sp (entry f = face between cells f | f+1; tail entry along ax junk).
    """
    plan = _plan_blocking(sp.shape, ax)
    if plan is None:
        return None
    block, grid, grid_axes = plan
    ndim = sp.ndim
    out_shape = sp.shape

    in_specs = [
        _spec_for(sp.shape, block, grid_axes, ndim,
                  full_shape=sp.shape),
        _spec_for(up.shape, block, grid_axes, ndim,
                  full_shape=sp.shape),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    out_specs = tuple(_spec_for(out_shape, block, grid_axes, ndim,
                                full_shape=sp.shape)
                      for _ in range(3))
    kern = functools.partial(_ppm_kernel, ax=ax, use_limiting=use_limiting)
    scal = jnp.stack([jnp.asarray(dt_over_dx, sp.dtype),
                      jnp.asarray(corr_coef_over_dx, sp.dtype)])
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(jax.ShapeDtypeStruct(out_shape, sp.dtype)
                        for _ in range(3)),
        interpret=interpret,
    )(sp, up, scal)


# --------------------------------------------------------------------------
# P2: the 3D CTU cross-correction kernel
# --------------------------------------------------------------------------
def _corr3_kernel(*refs, ax: int, ncorr: int):
    """refs = (lo1, hi1, u, corr2_0..corr2_{ncorr-1}, scal,
               out_0..out_{ncorr-1}); all stencils along ax."""
    lo1 = refs[0][...]
    hi1 = refs[1][...]
    u = refs[2][...]
    corrs = [refs[3 + i][...] for i in range(ncorr)]
    scal = refs[3 + ncorr]
    dt2dx = scal[0]
    outs = refs[4 + ncorr:]

    vf = 0.5 * (u + _kshift_p(u, ax))
    for i, c in enumerate(corrs):
        lo_c = lo1 + c
        hi_c = hi1 + _kshift_p(c, ax)
        rie2 = _kriemann(lo_c, hi_c, vf)
        outs[i][...] = -dt2dx * u * (rie2 - _kshift_m(rie2, ax))


def ctu_corr3_pallas(lo1_j, hi1_j, u_pad_j, corr2_list: Sequence,
                     dt_half_over_dx, ax: int, interpret: bool = False):
    """Stage-2+3 cross terms for face direction j (array axis `ax`).

    For each corr2_k in corr2_list returns
      corr3_(j,k) = -(dt/2)/dx_j * u_j * d/dxi_j [ Riemann(
          lo1_j + corr2_k, hi1_j + shift(corr2_k), facevg(u_j) ) ]
    as a cell array of the same padded shape.  Returns None if no feasible
    blocking (caller falls back to jnp).
    """
    plan = _plan_blocking(lo1_j.shape, ax)
    if plan is None:
        return None
    block, grid, grid_axes = plan
    ndim = lo1_j.ndim
    ncorr = len(corr2_list)
    arrs = (lo1_j, hi1_j, u_pad_j) + tuple(corr2_list)
    out_shape = arrs[0].shape

    in_specs = ([_spec_for(a.shape, block, grid_axes, ndim,
                           full_shape=lo1_j.shape) for a in arrs]
                + [pl.BlockSpec(memory_space=pltpu.SMEM)])
    out_specs = tuple(_spec_for(out_shape, block, grid_axes, ndim,
                                full_shape=lo1_j.shape)
                      for _ in range(ncorr))
    kern = functools.partial(_corr3_kernel, ax=ax, ncorr=ncorr)
    scal = jnp.stack([jnp.asarray(dt_half_over_dx, arrs[0].dtype)])
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(jax.ShapeDtypeStruct(out_shape, arrs[0].dtype)
                        for _ in range(ncorr)),
        interpret=interpret,
    )(*arrs, scal)


# --------------------------------------------------------------------------
# P3: stage-3 assembly + final Riemann against the advecting velocity
# --------------------------------------------------------------------------
def _final_kernel(*refs, ax: int, nc3: int, has_src: bool, want_pre: bool,
                  want_rie: bool, want_div: bool):
    """refs = (lo1, hi1[, adv], c3_0..c3_{nc3-1}[, src], scal,
               [rie|div][, lo_f, hi_f]); stencils (the correction-sum
    shift, and the flux difference for want_div) are along ax only."""
    lo1 = refs[0][...]
    hi1 = refs[1][...]
    idx = 2
    adv = None
    if want_rie or want_div:
        adv = refs[idx][...]
        idx += 1
    c3s = [refs[idx + i][...] for i in range(nc3)]
    idx += nc3
    src = refs[idx][...] if has_src else None
    scal = refs[idx + (1 if has_src else 0)]
    outs = refs[idx + (1 if has_src else 0) + 1:]

    csum = c3s[0]
    for c in c3s[1:]:
        csum = csum + c
    if src is not None:
        csum = csum + scal[0] * src
    lo_f = lo1 + csum
    hi_f = hi1 + _kshift_p(csum, ax)
    o = 0
    if want_div:
        # undivided flux difference at cells: F[c] - F[c-1] with
        # F = Riemann(lo_f, hi_f, adv) * adv — emitting this instead of
        # the Riemann state saves the separate XLA flux-product +
        # difference passes (the profiled pad_multiply/sub fusions)
        F = _kriemann(lo_f, hi_f, adv) * adv
        outs[o][...] = F - _kshift_m(F, ax)
        o += 1
    elif want_rie:
        outs[o][...] = _kriemann(lo_f, hi_f, adv)
        o += 1
    if want_pre:
        outs[o][...] = lo_f
        outs[o + 1][...] = hi_f


def ctu_final_pallas(lo1_d, hi1_d, adv_pad_d, c3_list: Sequence,
                     src_pad, half_dt, ax: int, want_pre: bool = False,
                     want_rie: bool = True, want_div: bool = False,
                     interpret: bool = False):
    """Final face states of direction d (array axis `ax`), all padded
    face-indexed shapes:
      csum = sum(c3_list) + (dt/2) src
      lo_f = lo1 + csum;  hi_f = hi1 + shift_p(csum, ax)
      rie  = Riemann(lo_f, hi_f, adv_pad)
    Returns (rie,[ lo_f, hi_f]) per the want_rie/want_pre flags (callers
    that re-upwind the pre-Riemann states against a later advecting
    velocity skip the rie write — a full padded-array HBM store).  With
    want_div the first output is instead the cell-indexed undivided flux
    difference  (rie*adv)[c] - (rie*adv)[c-1]  (want_rie ignored).  None
    if no feasible blocking."""
    assert want_rie or want_pre or want_div
    plan = _plan_blocking(lo1_d.shape, ax)
    if plan is None:
        return None
    block, grid, grid_axes = plan
    ndim = lo1_d.ndim
    has_src = src_pad is not None
    nc3 = len(c3_list)
    if want_div:
        want_rie = False
    arrs = (lo1_d, hi1_d)
    if want_rie or want_div:
        arrs = arrs + (adv_pad_d,)
    arrs = arrs + tuple(c3_list)
    if has_src:
        arrs = arrs + (src_pad,)
    nout = (1 if (want_rie or want_div) else 0) + (2 if want_pre else 0)

    in_specs = ([_spec_for(a.shape, block, grid_axes, ndim,
                           full_shape=lo1_d.shape) for a in arrs]
                + [pl.BlockSpec(memory_space=pltpu.SMEM)])
    out_specs = tuple(_spec_for(lo1_d.shape, block, grid_axes, ndim,
                                full_shape=lo1_d.shape)
                      for _ in range(nout))
    kern = functools.partial(_final_kernel, ax=ax, nc3=nc3,
                             has_src=has_src, want_pre=want_pre,
                             want_rie=want_rie, want_div=want_div)
    scal = jnp.stack([jnp.asarray(half_dt, lo1_d.dtype)])
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(jax.ShapeDtypeStruct(lo1_d.shape, lo1_d.dtype)
                        for _ in range(nout)),
        interpret=interpret,
    )(*arrs, scal)
    return out if isinstance(out, tuple) else (out,)


# --------------------------------------------------------------------------
# P4: deferred re-upwinding + flux difference (the momentum path)
# --------------------------------------------------------------------------
def _reflux_kernel(*refs, ax: int, nf: int):
    """refs = (adv, lo_0, hi_0, .., lo_{nf-1}, hi_{nf-1},
               out_0..out_{nf-1}); stencil along ax only."""
    adv = refs[0][...]
    outs = refs[1 + 2 * nf:]
    for i in range(nf):
        lo = refs[1 + 2 * i][...]
        hi = refs[2 + 2 * i][...]
        F = _kriemann(lo, hi, adv) * adv
        outs[i][...] = F - _kshift_m(F, ax)


def riemann_fluxdiv_pallas(pre_pairs: Sequence, adv_pad_d, ax: int,
                           interpret: bool = False):
    """Fused final Riemann + flux difference for direction d (array axis
    `ax`): for each stashed (lo_f, hi_f) pair (one per field, all padded
    face-indexed) returns the cell-indexed undivided difference
      (rie*adv)[c] - (rie*adv)[c-1],   rie = Riemann(lo_f, hi_f, adv).
    This replaces the XLA pad_multiply + sub fusion pair per (field,
    direction) that the profiler shows re-materializing the flux products
    (the NS momentum update's re-upwinding of the stashed traces).
    Returns a list per field, or None if no feasible blocking."""
    shape = adv_pad_d.shape
    plan = _plan_blocking(shape, ax)
    if plan is None:
        return None
    block, grid, grid_axes = plan
    ndim = adv_pad_d.ndim
    nf = len(pre_pairs)
    arrs = (adv_pad_d,) + tuple(x for pair in pre_pairs for x in pair)
    in_specs = [_spec_for(a.shape, block, grid_axes, ndim,
                          full_shape=shape) for a in arrs]
    out_specs = tuple(_spec_for(shape, block, grid_axes, ndim,
                                full_shape=shape) for _ in range(nf))
    kern = functools.partial(_reflux_kernel, ax=ax, nf=nf)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(jax.ShapeDtypeStruct(shape, adv_pad_d.dtype)
                        for _ in range(nf)),
        interpret=interpret,
    )(*arrs)
    return list(out) if isinstance(out, tuple) else [out]
