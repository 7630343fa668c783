"""Unsplit Godunov (CTU) advection: PLM/PPM tracing + limiters + upwinding.

Re-design of the reference's advection layer
(`/root/reference/src/advection/AdvectUtil.H:42` MappedAdvectionUtil::
predictScalar, `MappedGodunovUtilities.H:41` — kernels PLMNormalPredF,
PPMNormalPredF, PPMFaceValuesF, PPMLimiterF, VanLeerLimiterF,
RiemannSolver, QuasilinearUpdateF in AdvectUtilF.ChF /
MappedGodunovUtilitiesF.ChF).  The reference runs these as per-box Fortran
loops; here each stage is a whole-level shift-and-select expression fused
by XLA — the entire predictor for one direction is one fused kernel.

Scheme (Colella's unsplit corner-transport-upwind; mapped grids trace in
xi-space with the contravariant velocity):
  1. normal predictor per direction: CTU(0) / PLM(1) / PPM(2) half-step
     traced left/right face states, with optional van-Leer or 4th-order
     limited slopes (PLM) or CW84 parabola limiting (PPM);
  2. transverse corrections: 1D Riemann states of the other directions
     feed an advective-form quasilinear correction (full 3-stage CTU in
     3D with the dt/3 intermediate states);
  3. Riemann upwinding by the face advecting velocity;
  4. conservative flux divergence (1/J) d_d (J u^d s) or advective form.

Ghost requirement: 4 layers (reference ADVECT_GROW, AdvectUtil.H:35).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from somar_tpu.core.bc import FieldBCs, fill_ghosts_cc
from somar_tpu.core.grid import Grid
from somar_tpu.geometry.level_geometry import LevelGeometry
from somar_tpu.ops.stencil import (slc, avg_along, diff_along,
                                   face_avg, shift_m, shift_p)

ADVECT_GROW = 4


def _use_pallas_predictor() -> bool:
    """Fused Pallas PPM predictor: on TPU when the trace is shard-local
    (inside a shard_map island, or the process owns one device — see
    parallel/pallas_gate.py: Pallas custom calls are unpartitionable
    under GSPMD).  Env-overridable with SOMAR_PALLAS=0/1."""
    import os
    flag = os.environ.get("SOMAR_PALLAS", "")
    if flag in ("0", "off"):
        return False
    if flag in ("1", "on"):
        return True
    import jax
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    from somar_tpu.parallel.pallas_gate import default_allowed
    return default_allowed()


def _pallas_interpret() -> bool:
    """Off-TPU (e.g. SOMAR_PALLAS=on in a CPU multichip dryrun) the CTU
    kernels run through the Pallas interpreter."""
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


@dataclasses.dataclass(frozen=True)
class AdvectionParams:
    """Reference: `advection.*` input namespace (ProblemContext.H:291-316)."""

    normal_pred_order: int = 2        # 0=CTU, 1=PLM, 2=PPM
    use_fourth_order_slopes: bool = True
    use_limiting: bool = True
    use_high_order_limiter: bool = False  # extremum-preserving variant
    #: advection.useUpwinding{Vel,Scal}: False replaces the Riemann
    #: upwind selection with the face average (central fluxes)
    use_upwinding: bool = True


def _win(arr, ax: int, k: int, lo: int, n: int):
    """Window of length n starting at padded index lo+k along axis ax."""
    s = [slice(None)] * arr.ndim
    s[ax] = slice(lo + k, lo + k + n)
    return arr[tuple(s)]


# --------------------------------------------------------------------------
# same-shape shifted copies.  Every intermediate of the predictor keeps the
# FULL padded cell shape ("face-indexed" arrays: entry f = the face between
# cells f and f+1, last entry junk).  Uniform shapes are a TPU perf
# requirement: materialized arrays of length n-1 along the 128-lane axis
# force whole-array lane relayouts (measured ~6x bandwidth on v5e), and
# mixed 519/520/640-lane shapes defeat XLA fusion across the CTU stages.
# The junk entries live in ghost space and are cropped before use
# (ADVECT_GROW = 4 leaves margin).
# --------------------------------------------------------------------------
# shift_p / shift_m / face_avg now live in ops/stencil.py (re-exported
# here for the face-indexed convention users).


# --------------------------------------------------------------------------
# slope kernels (reference: MappedGodunovUtilities van Leer / 4th order)
# --------------------------------------------------------------------------
def _vanleer_slope(sm, s0, sp, limit: bool):
    dc = 0.5 * (sp - sm)
    if not limit:
        return dc
    dl = s0 - sm
    dr = sp - s0
    lim = 2.0 * jnp.minimum(jnp.abs(dl), jnp.abs(dr))
    mono = (dl * dr) > 0.0
    return jnp.where(mono, jnp.sign(dc) * jnp.minimum(jnp.abs(dc), lim), 0.0)


def _fourth_order_slope(smm, sm, s0, sp, spp, limit: bool):
    """delta4 = (2/3)[(s_{+1} - s_{-1}) - (dvL_{+1} + dvL_{-1})/4]
    (reference: fourthOrderSlopes / FOURTHSLOPEDIFFSF)."""
    dvl_m = _vanleer_slope(smm, sm, s0, limit)
    dvl_p = _vanleer_slope(s0, sp, spp, limit)
    d4 = (2.0 / 3.0) * ((sp - sm) - 0.25 * (dvl_p + dvl_m))
    if not limit:
        return d4
    dl = s0 - sm
    dr = sp - s0
    lim = 2.0 * jnp.minimum(jnp.abs(dl), jnp.abs(dr))
    mono = (dl * dr) > 0.0
    return jnp.where(mono, jnp.sign(d4) * jnp.minimum(jnp.abs(d4), lim), 0.0)


def _ext_preserving_slope(dwc, smm, sm, s0, sp, spp):
    """Extremum-preserving van Leer limiting of a centered (or 4th-order)
    slope `dwc` (reference: slopeLimiterExtPreserving /
    ExtPreservingVanLeerLimiterF, MappedGodunovUtilities.H:155,
    MappedGodunovUtilitiesF.ChF:188; Colella & Sekora 2008): where
    adjacent one-sided differences change sign (a resolved extremum) the
    slope is limited by SECOND differences instead of being zeroed, so
    genuine smooth extrema keep their accuracy while discontinuities
    remain clipped."""
    dwl = s0 - sm
    dwll = sm - smm
    dwr = sp - s0
    dwrr = spp - sp
    dpmin = jnp.minimum(dwl * dwr, dwll * dwrr)
    # extremum branch: limit via second differences
    dw2l = dwl - dwll
    dw2c = 0.5 * (dwr - dwl)
    dw2r = dwrr - dwr
    s2 = jnp.sign(dw2c)
    dw2lim = jnp.minimum(jnp.abs(dw2c),
                         jnp.minimum(jnp.maximum(s2 * dw2l, 0.0),
                                     jnp.maximum(s2 * dw2r, 0.0)))
    dwvl = 1.25 * 1.5 * dw2lim
    dwlim_ext = jnp.where(s2 * dwc < 0.0,
                          jnp.minimum(dwvl, 2.0 * jnp.abs(dwl)),
                          jnp.minimum(dwvl, 2.0 * jnp.abs(dwr)))
    dwlim_mono = 2.0 * jnp.minimum(jnp.abs(dwl), jnp.abs(dwr))
    dwlim = jnp.where(dpmin < 0.0, dwlim_ext, dwlim_mono)
    return jnp.sign(dwc) * jnp.minimum(jnp.abs(dwc), dwlim)


def _cc_deriv(face_arr, ax: int, dx: float):
    """Cell-centered derivative of a face-indexed array: the flux
    difference across cell c is face[c] - face[c-1] (junk at c = 0)."""
    return (face_arr - shift_m(face_arr, ax)) / dx


# --------------------------------------------------------------------------
# Riemann upwinding
# --------------------------------------------------------------------------
def _riemann(lo, hi, vface, small: float = 1e-12):
    """Passive-advection Riemann: upwind by face velocity (reference:
    RiemannSolver kernel, AdvectUtilF.ChF)."""
    avg = 0.5 * (lo + hi)
    return jnp.where(vface > small, lo, jnp.where(vface < -small, hi, avg))


def _riemann_avg(lo, hi, vface, small: float = 1e-12):
    """Central face states (advection.useUpwinding* = 0)."""
    return 0.5 * (lo + hi)


# --------------------------------------------------------------------------
# the full CTU predictor
# --------------------------------------------------------------------------
def trace_face_states(
    s,                      # CC scalar to advect
    vel_mapped_cc,          # (ndim,)+shape contravariant CC velocity (tracing)
    adv_vel,                # tuple of FC J u^d advecting velocities
    src,                    # CC source term (or None): added as dt/2 * src
    dt: float,
    geo: LevelGeometry,
    bcs: FieldBCs,
    params: AdvectionParams,
    vel_bcs: Optional[Sequence[FieldBCs]] = None,
    u_pad: Optional[Sequence] = None,
    out_dirs: Optional[Sequence[int]] = None,
    return_pre_riemann: bool = False,
    padded: bool = False,
    rie_dirs: Optional[Sequence[int]] = None,
    want_div: bool = False,
):
    """Predict time-centered upwind face states of `s` in every direction.

    u_pad: optional precomputed ADVECT_GROW-padded tracing velocities (one
    per direction) — the NS step traces 5+ fields per substep and shares
    one fill (the pads are identical across fields).
    Returns a tuple of face-state arrays per logical dir d: fc_shape(d)
    (valid faces) by default, or full padded face-indexed arrays with
    `padded=True` — the TPU fast path, in which case `adv_vel` must also
    be padded face-indexed (see pad_valid_faces) and the final assembly +
    Riemann runs inside the P3 Pallas kernel; consumers crop once at the
    very end (flux_divergence(..., padded=True)).

    return_pre_riemann: also return the (lo, hi) face-state pairs per
    direction BEFORE the final Riemann upwinding (cropped, or padded with
    `padded=True`).  The traced states depend only on (s, u_pad, src, dt)
    — NOT on adv_vel, which enters only through the final upwinding — so
    a caller that upwinds the same field against a second advecting
    velocity (the NS step's momentum update re-uses the advecting
    -velocity prediction's traces, riemann_from_states below) skips the
    whole predictor.

    rie_dirs: restrict which directions' FINAL Riemann outputs are wanted
    (requires return_pre_riemann for the others to be meaningful).  With
    the P3 Pallas kernel this skips a full padded-array HBM store per
    excluded direction — XLA DCEs unused jnp outputs on its own, but a
    kernel's outputs are explicit writes.  Excluded entries of the
    returned faces tuple are None.

    want_div (padded only): each returned entry is the cell-indexed
    UNDIVIDED flux difference  (rie*adv)[c] - (rie*adv)[c-1]  instead of
    the Riemann face state — the P3 kernel folds the flux product and
    difference in (see divergence_from_partials), skipping the XLA
    flux-product materialization passes.
    """
    grid = geo.grid
    ndim = grid.ndim
    G = ADVECT_GROW
    shape = grid.shape

    sp = fill_ghosts_cc(s, grid, bcs, G)
    # the dt/2 * src half-step source is added to the traced face states in
    # stage 3 (equivalent to pre-adding it to the predictor, O(dt^2))
    riem = _riemann if params.use_upwinding else _riemann_avg

    # padded tracing velocities, one per direction
    if u_pad is None:
        if vel_bcs is None:
            vel_bcs = [bcs] * ndim
        u_pad = [fill_ghosts_cc(vel_mapped_cc[d], grid, vel_bcs[d], G)
                 for d in range(ndim)]

    # ------------------------------------------------ stage 1: 1D states
    # (fused Pallas P1 kernel on TPU: one VMEM pass per direction computes
    # PPM faces + limiter + trace + stage-1 Riemann + the shared
    # transverse correction corr2 = -coef u d(rie)/dxi, coef = dt/3 in 3D
    # CTU stage 2 / dt/2 in 2D where it IS the stage-3 correction)
    use_pallas = (params.normal_pred_order == 2
                  and params.use_upwinding
                  and not params.use_high_order_limiter
                  and _use_pallas_predictor())
    coef = dt / 3.0 if ndim == 3 else dt / 2.0
    lo1, hi1, corr2 = [], [], []
    for d in range(ndim):
        ax = grid.axis(d)
        got = None
        if use_pallas:
            from somar_tpu.ops.pallas_kernels import ppm_predict_pallas
            got = ppm_predict_pallas(
                sp, u_pad[d], dt / grid.dx[d], ax, params.use_limiting,
                corr_coef_over_dx=coef / grid.dx[d],
                interpret=_pallas_interpret())
        if got is None:
            # jnp predictor (full padded tangential extent kept: the
            # transverse stages need ghost coverage)
            lo_d, hi_d = _normal_predict_fullpad(
                sp, u_pad[d], ax, G, grid.dx[d], dt, params)
            rie_d = riem(lo_d, hi_d, face_avg(u_pad[d], ax))
            c2_d = -coef * u_pad[d] * _cc_deriv(rie_d, ax, grid.dx[d])
        else:
            lo_d, hi_d, c2_d = got
        lo1.append(lo_d)
        hi1.append(hi_d)
        corr2.append(c2_d)

    # -------------------------- stage 2+3 cross terms (3D; P2 kernels)
    # corr3[(j, k)] = -(dt/2) u_j d/dxi_j [Riemann(lo1_j + corr2_k, ...)]
    # — the final stage-3 correction along j for output direction
    # d = 3-j-k.  out_dirs restricts which pairs are built (the advecting
    # -velocity prediction consumes only the normal component per dir).
    dirs = list(range(ndim)) if out_dirs is None else list(out_dirs)
    corr3 = {}
    if ndim == 3:
        by_j = {}
        for dd in dirs:
            for j in range(ndim):
                if j != dd:
                    by_j.setdefault(j, []).append(3 - dd - j)
        for j, ks in sorted(by_j.items()):
            ks = sorted(set(ks))
            axj = grid.axis(j)
            got = None
            if use_pallas:
                from somar_tpu.ops.pallas_kernels import ctu_corr3_pallas
                got = ctu_corr3_pallas(
                    lo1[j], hi1[j], u_pad[j], [corr2[k] for k in ks],
                    (dt / 2.0) / grid.dx[j], axj,
                    interpret=_pallas_interpret())
            if got is None:
                got = []
                for k in ks:
                    lo_c = lo1[j] + corr2[k]
                    hi_c = hi1[j] + shift_p(corr2[k], axj)
                    rie2 = riem(lo_c, hi_c, face_avg(u_pad[j], axj))
                    got.append(-(dt / 2.0) * u_pad[j]
                               * _cc_deriv(rie2, axj, grid.dx[j]))
            for k, c3 in zip(ks, got):
                corr3[(j, k)] = c3

    # ------------------------------------------- stage 3: final face states
    src_pad = (fill_ghosts_cc(src, grid, bcs, G) if src is not None
               else None)
    out = {}
    pre = {}
    for d in dirs:
        ax = grid.axis(d)
        want_rie_d = rie_dirs is None or d in rie_dirs
        c3_list = ([corr3[(j, 3 - d - j)] for j in range(ndim) if j != d]
                   if ndim == 3 else [corr2[1 - d]])
        got = None
        if use_pallas and padded and (want_rie_d or return_pre_riemann
                                      or want_div):
            from somar_tpu.ops.pallas_kernels import ctu_final_pallas
            got = ctu_final_pallas(lo1[d], hi1[d], adv_vel[d], c3_list,
                                   src_pad, 0.5 * dt, ax,
                                   want_pre=return_pre_riemann,
                                   want_rie=want_rie_d,
                                   want_div=want_div,
                                   interpret=_pallas_interpret())
        if got is not None:
            i = 0
            if want_rie_d or want_div:
                out[d] = got[0]
                i = 1
            if return_pre_riemann:
                pre[d] = (got[i], got[i + 1])
            continue
        csum = c3_list[0]
        for c in c3_list[1:]:
            csum = csum + c
        if src_pad is not None:
            csum = csum + 0.5 * dt * src_pad
        lo_f = lo1[d] + csum
        hi_f = hi1[d] + shift_p(csum, ax)
        # CRITICAL TPU perf barrier: without it XLA fuses the whole CTU
        # DAG into each consumer BY DUPLICATION — every shift/identity
        # diamond doubles the recompute, and the final flux divergence
        # re-evaluates the predictor ~2^depth times (measured 15 ms/trace
        # vs 0.2 ms with the barrier at 512x128x128 on v5e).
        lo_f, hi_f = jax.lax.optimization_barrier((lo_f, hi_f))
        if padded:
            pre[d] = (lo_f, hi_f)
            if want_div:
                F = riem(lo_f, hi_f, adv_vel[d]) * adv_vel[d]
                out[d] = F - shift_m(F, ax)
            else:
                out[d] = riem(lo_f, hi_f, adv_vel[d])
            continue
        # crop to valid faces/cells and final Riemann with the advecting vel
        lo_v = _crop_faces(lo_f, grid, d, G)
        hi_v = _crop_faces(hi_f, grid, d, G)
        pre[d] = (lo_v, hi_v)
        out[d] = riem(lo_v, hi_v, adv_vel[d])
    faces = tuple(out.get(d) for d in range(ndim))
    if return_pre_riemann:
        return faces, tuple(pre.get(d) for d in range(ndim))
    return faces


def riemann_from_states(pre_states, adv_vel, upwind: bool = True):
    """Final Riemann upwinding of precomputed (lo, hi) face states against
    a (new) advecting velocity — the re-use path of trace_face_states's
    return_pre_riemann."""
    riem = _riemann if upwind else _riemann_avg
    return tuple(
        riem(lo, hi, adv_vel[d])
        for d, (lo, hi) in enumerate(pre_states))


def _normal_predict_fullpad(sp, u_pad, ax: int, G: int, dx: float, dt: float,
                            params: AdvectionParams):
    """Like _normal_predict but on the full padded array: produces face
    states on all interior-computable faces of the padded array (losing
    `need` cells each side along ax, keeping tangential padding)."""
    hol = params.use_high_order_limiter and params.use_limiting
    if params.normal_pred_order == 2:
        need = 3 if hol else 2
    else:
        need = 2 if (params.use_fourth_order_slopes or hol) else 1
    n_pad = sp.shape[ax]
    ncell = n_pad - 2 * need

    def cell(k):
        return _win(sp, ax, k, need, ncell)

    u = _win(u_pad, ax, 0, need, ncell)
    s0 = cell(0)
    nu = u * dt / dx

    if params.normal_pred_order == 0:
        splus = s0
        sminus = s0
    elif params.normal_pred_order == 1:
        if hol:
            # extremum-preserving limit of the raw (unlimited) slope
            if params.use_fourth_order_slopes:
                raw = _fourth_order_slope(cell(-2), cell(-1), s0, cell(1),
                                          cell(2), False)
            else:
                raw = 0.5 * (cell(1) - cell(-1))
            d = _ext_preserving_slope(raw, cell(-2), cell(-1), s0,
                                      cell(1), cell(2))
        elif params.use_fourth_order_slopes:
            d = _fourth_order_slope(cell(-2), cell(-1), s0, cell(1), cell(2),
                                    params.use_limiting)
        else:
            d = _vanleer_slope(cell(-1), s0, cell(1), params.use_limiting)
        splus = s0 + 0.5 * (1.0 - jnp.maximum(nu, 0.0)) * d
        sminus = s0 - 0.5 * (1.0 + jnp.minimum(nu, 0.0)) * d
    else:
        def face(k):
            return (7.0 / 12.0) * (cell(k) + cell(k + 1)) \
                - (1.0 / 12.0) * (cell(k - 1) + cell(k + 2))

        sR = face(0)
        sL = face(-1)
        if hol:
            # Colella-Sekora (2008) extremum-preserving cubic limiter
            # (reference: MappedGodunovUtilities::PPMLimiter high-order
            # branch + CheckCubicLimiterF, limitC=1.25 c3=0.1 eps=1e-12):
            # genuine smooth extrema are rescaled by rho = D2lim/D2fcf
            # instead of flattened; discontinuities still clip to the
            # standard parabola bounds.
            limitC, c3, eps = 1.25, 0.1, 1e-12
            dWM = sL - s0
            dWP = sR - s0

            def d2(k):
                return cell(k - 1) - 2.0 * cell(k) + cell(k + 1)

            d2WLL, d2WL, d2WC = d2(-2), d2(-1), d2(0)
            d2WR, d2WRR = d2(1), d2(2)
            fcf = 6.0 * (dWM + dWP)     # D2 of the face-cell-face parabola
            bigM = jnp.abs(dWM) > 2.0 * jnp.abs(dWP)
            bigP = jnp.abs(dWP) > 2.0 * jnp.abs(dWM)
            prodE1 = dWM * dWP
            prodE2 = (s0 - cell(-2)) * (cell(2) - s0)
            extremum = (prodE1 >= 0.0) | (prodE2 <= 0.0)
            sC = jnp.sign(d2WC)
            same = ((jnp.sign(d2WL) == sC) & (jnp.sign(d2WR) == sC)
                    & (jnp.sign(fcf) == sC))
            d2Wlim = sC * jnp.minimum(
                jnp.abs(fcf),
                limitC * jnp.minimum(jnp.abs(d2WC),
                                     jnp.minimum(jnp.abs(d2WL),
                                                 jnp.abs(d2WR))))
            nonzero = jnp.abs(fcf) >= eps
            rho = jnp.where(same & nonzero,
                            d2Wlim / jnp.where(nonzero, fcf, 1.0), 0.0)
            # third-derivative check: near a cubic profile, leave alone
            d3WLL = d2WL - d2WLL
            d3WL = d2WC - d2WL
            d3WR = d2WR - d2WC
            d3WRR = d2WRR - d2WR
            d3min = jnp.minimum(jnp.minimum(d3WLL, d3WL),
                                jnp.minimum(d3WR, d3WRR))
            d3max = jnp.maximum(jnp.maximum(d3WLL, d3WL),
                                jnp.maximum(d3WR, d3WRR))
            prodD3 = (c3 * jnp.maximum(jnp.abs(d3max), jnp.abs(d3min))
                      - jnp.abs(d3max - d3min))
            mod = extremum & (rho < 1.0 - eps) & (prodD3 <= 0.0)
            shrink = prodE1 > 0.0
            dWMn = jnp.where(
                mod,
                jnp.where(shrink, dWM * rho,
                          jnp.where(bigM,
                                    dWM * rho - 2.0 * dWP * (1.0 - rho),
                                    dWM)),
                jnp.where(~extremum & bigM, -2.0 * dWP, dWM))
            dWPn = jnp.where(
                mod,
                jnp.where(shrink, dWP * rho,
                          jnp.where(bigP,
                                    dWP * rho - 2.0 * dWM * (1.0 - rho),
                                    dWP)),
                jnp.where(~extremum & bigP, -2.0 * dWM, dWP))
            sL = s0 + dWMn
            sR = s0 + dWPn
        elif params.use_limiting:
            flat = (sR - s0) * (s0 - sL) <= 0.0
            dsum = sR - sL
            s6_t = 6.0 * (s0 - 0.5 * (sL + sR))
            cond_l = dsum * s6_t > dsum * dsum
            cond_r = -dsum * dsum > dsum * s6_t
            sLn = jnp.where(flat, s0, jnp.where(cond_l, 3.0 * s0 - 2.0 * sR, sL))
            sRn = jnp.where(flat, s0, jnp.where(cond_r, 3.0 * s0 - 2.0 * sL, sR))
            sL, sR = sLn, sRn
        dsum = sR - sL
        s6 = 6.0 * (s0 - 0.5 * (sL + sR))
        sig_p = jnp.maximum(nu, 0.0)
        sig_m = jnp.maximum(-nu, 0.0)
        splus = sR - 0.5 * sig_p * (dsum - (1.0 - (2.0 / 3.0) * sig_p) * s6)
        sminus = sL + 0.5 * sig_m * (dsum + (1.0 - (2.0 / 3.0) * sig_m) * s6)

    # pad back to original cell extent along ax so downstream indexing is
    # uniform: re-pad with edge values (they sit in ghost space and are
    # cropped before use)
    pad = [(0, 0)] * sp.ndim
    pad[ax] = (need, need)
    splus = jnp.pad(splus, pad, mode="edge")
    sminus = jnp.pad(sminus, pad, mode="edge")
    # face-indexed, full length n_pad: entry f = face between cells f|f+1;
    # lo comes from the left cell f, hi from the right cell f+1
    return splus, shift_p(sminus, ax)


def _crop_faces(face_pad, grid: Grid, d: int, G: int, lead: int = 0):
    """Crop a face-indexed padded array to the valid faces of dir d
    (n+1 of them: entries G-1 .. G+n) and valid cells of the other axes
    (`lead` extra leading batch axes are kept whole)."""
    out = face_pad
    for j in range(grid.ndim):
        ax = grid.axis(j) + lead
        if j == d:
            out = slc(out, ax, G - 1, G + grid.nx[d])
        else:
            out = slc(out, ax, G, -G)
    return out


def _crop_cells(cc_pad, grid: Grid, G: int, lead: int = 0):
    """Crop a padded cell array to the valid region (`lead` extra leading
    batch axes are kept whole)."""
    out = cc_pad
    for j in range(grid.ndim):
        out = slc(out, grid.axis(j) + lead, G, G + grid.nx[j])
    return out


def pad_valid_faces(valid, grid: Grid, d: int, G: int = ADVECT_GROW):
    """Embed a valid (n+1)-face array of dir d into the padded
    face-indexed shape (zeros at ghost entries) — entry f = face between
    padded cells f | f+1, so valid face i lands at padded index G-1+i."""
    pad = [(0, 0)] * valid.ndim
    for j in range(grid.ndim):
        ax = grid.axis(j)
        pad[ax] = (G - 1, G) if j == d else (G, G)
    return jnp.pad(valid, pad)


# --------------------------------------------------------------------------
# flux divergence updates
# --------------------------------------------------------------------------
def flux_divergence(face_states: Sequence, adv_vel: Sequence,
                    geo: LevelGeometry, padded: bool = False):
    """Conservative update term  (1/J) d_d (J u^d s)  (nonlinear
    differencing form 0, reference getNewVelocity:886+).

    padded=True: face_states and adv_vel are padded face-indexed arrays;
    the divergence is computed with same-shape shifts and cropped ONCE to
    the valid cells (the TPU fast path — shape-changing lane slices feed
    no further computation)."""
    grid = geo.grid
    out = None
    for d in range(grid.ndim):
        ax = grid.axis(d)
        F = face_states[d] * adv_vel[d]
        if padded:
            term = (F - shift_m(F, ax)) / grid.dx[d]
        else:
            term = diff_along(F, ax) / grid.dx[d]
        out = term if out is None else out + term
    if padded:
        out = _crop_cells(out, grid, ADVECT_GROW)
    return out * geo.Jinv


def divergence_from_partials(partials: Sequence, geo: LevelGeometry):
    """Conservative update term from per-direction UNDIVIDED flux
    differences (the want_div trace outputs / riemann_fluxdiv_pallas):
      out = (1/J) sum_d dF_d / dx_d,  cropped once to valid cells."""
    grid = geo.grid
    out = None
    for d in range(grid.ndim):
        term = partials[d] / grid.dx[d]
        out = term if out is None else out + term
    return _crop_cells(out, grid, ADVECT_GROW) * geo.Jinv


def momentum_flux_divergence(pre_list: Sequence, adv_pad: Sequence,
                             geo: LevelGeometry, upwind: bool = True):
    """Deferred momentum update: re-upwind each field's stashed
    (lo_f, hi_f) pairs against the projected advecting velocity and form
    the conservative flux divergence, via ONE fused P4 kernel per
    direction batched over the fields (ops/pallas_kernels.py
    riemann_fluxdiv_pallas).  pre_list: per field, per dir (lo, hi)
    padded pairs.  Returns one valid-cell divergence per field."""
    grid = geo.grid
    nf = len(pre_list)
    use_pallas = upwind and _use_pallas_predictor()
    riem = _riemann if upwind else _riemann_avg
    partials = [[None] * grid.ndim for _ in range(nf)]
    for d in range(grid.ndim):
        ax = grid.axis(d)
        pairs = [pre_list[f][d] for f in range(nf)]
        got = None
        if use_pallas:
            from somar_tpu.ops.pallas_kernels import riemann_fluxdiv_pallas
            got = riemann_fluxdiv_pallas(pairs, adv_pad[d], ax)
        if got is None:
            got = []
            for lo, hi in pairs:
                F = riem(lo, hi, adv_pad[d]) * adv_pad[d]
                got.append(F - shift_m(F, ax))
        for f in range(nf):
            partials[f][d] = got[f]
    return [divergence_from_partials(p, geo) for p in partials]


def advective_form(face_states: Sequence, adv_vel: Sequence,
                   geo: LevelGeometry):
    """u . grad s  =  div(u s) - s div(u)  evaluated as
    (1/J)[d_d(J u^d s) - s d_d(J u^d)] (advective differencing form 1)."""
    grid = geo.grid
    div_us = None
    div_u = None
    for d in range(grid.ndim):
        ax = grid.axis(d)
        t1 = diff_along(face_states[d] * adv_vel[d], ax) / grid.dx[d]
        t2 = diff_along(adv_vel[d], ax) / grid.dx[d]
        div_us = t1 if div_us is None else div_us + t1
        div_u = t2 if div_u is None else div_u + t2
    s_cc = None
    # cell value of s: average the upwind face states of dir 0 (cheap, 2nd
    # order) — callers wanting exact advective form pass the CC s instead.
    s_cc = avg_along(face_states[0], grid.axis(0))
    return (div_us - s_cc * div_u) * geo.Jinv


# --------------------------------------------------------------------------
# batched padded-path predictor: trace B fields at once
# --------------------------------------------------------------------------
def trace_face_states_batched(
    fields: Sequence,          # B cell-centered fields
    srcs,                      # per-field CC source or None (or None)
    bcs_list: Sequence[FieldBCs],
    adv_vel: Sequence,         # per-dir PADDED face-indexed advecting vel
    dt: float,
    geo: LevelGeometry,
    params: AdvectionParams,
    u_pad: Sequence,           # per-dir padded tracing velocity (shared)
    out_dirs: Optional[Sequence[int]] = None,
    return_pre_riemann: bool = False,
):
    """Batched `trace_face_states(padded=True)`: the B fields ride a
    leading batch axis through the P1/P2/P3 kernels (one launch per
    direction per round instead of per field — the launch count, not the
    math, is what changes; the shared tracing/advecting velocities are
    lead-broadcast into the kernels).  Returns a tuple over d of
    (B,)+padded face arrays (+ the (lo, hi) pre-Riemann pairs)."""
    grid = geo.grid
    ndim = grid.ndim
    G = ADVECT_GROW

    sp = jnp.stack([fill_ghosts_cc(f, grid, b, G)
                    for f, b in zip(fields, bcs_list)])
    src_stack = None
    if srcs is not None and any(s is not None for s in srcs):
        zero = jnp.zeros(sp.shape[1:], sp.dtype)
        src_stack = jnp.stack([
            zero if s is None else fill_ghosts_cc(s, grid, b, G)
            for s, b in zip(srcs, bcs_list)])
    upl = [u_pad[d][None] for d in range(ndim)]
    advl = [adv_vel[d][None] for d in range(ndim)]

    use_pallas = (params.normal_pred_order == 2
                  and params.use_upwinding
                  and not params.use_high_order_limiter
                  and _use_pallas_predictor())
    riem = _riemann if params.use_upwinding else _riemann_avg
    coef = dt / 3.0 if ndim == 3 else dt / 2.0
    lo1, hi1, corr2 = [], [], []
    for d in range(ndim):
        ax = grid.axis(d) + 1
        got = None
        if use_pallas:
            from somar_tpu.ops.pallas_kernels import ppm_predict_pallas
            got = ppm_predict_pallas(
                sp, upl[d], dt / grid.dx[d], ax, params.use_limiting,
                corr_coef_over_dx=coef / grid.dx[d])
        if got is None:
            lo_d, hi_d = _normal_predict_fullpad(
                sp, upl[d], ax, G, grid.dx[d], dt, params)
            rie_d = riem(lo_d, hi_d, face_avg(upl[d], ax))
            got = (lo_d, hi_d,
                   -coef * upl[d] * _cc_deriv(rie_d, ax, grid.dx[d]))
        lo1.append(got[0])
        hi1.append(got[1])
        corr2.append(got[2])

    dirs = list(range(ndim)) if out_dirs is None else list(out_dirs)
    corr3 = {}
    if ndim == 3:
        by_j = {}
        for dd in dirs:
            for j in range(ndim):
                if j != dd:
                    by_j.setdefault(j, []).append(3 - dd - j)
        for j, ks in sorted(by_j.items()):
            ks = sorted(set(ks))
            axj = grid.axis(j) + 1
            got = None
            if use_pallas:
                from somar_tpu.ops.pallas_kernels import ctu_corr3_pallas
                got = ctu_corr3_pallas(
                    lo1[j], hi1[j], upl[j], [corr2[k] for k in ks],
                    (dt / 2.0) / grid.dx[j], axj)
            if got is None:
                got = []
                for k in ks:
                    lo_c = lo1[j] + corr2[k]
                    hi_c = hi1[j] + shift_p(corr2[k], axj)
                    rie2 = riem(lo_c, hi_c, face_avg(upl[j], axj))
                    got.append(-(dt / 2.0) * upl[j]
                               * _cc_deriv(rie2, axj, grid.dx[j]))
            for k, c3 in zip(ks, got):
                corr3[(j, k)] = c3

    out = {}
    pre = {}
    for d in dirs:
        ax = grid.axis(d) + 1
        c3_list = ([corr3[(j, 3 - d - j)] for j in range(ndim) if j != d]
                   if ndim == 3 else [corr2[1 - d]])
        got = None
        if use_pallas:
            from somar_tpu.ops.pallas_kernels import ctu_final_pallas
            got = ctu_final_pallas(lo1[d], hi1[d], advl[d], c3_list,
                                   src_stack, 0.5 * dt, ax,
                                   want_pre=return_pre_riemann)
        if got is not None:
            out[d] = got[0]
            if return_pre_riemann:
                pre[d] = (got[1], got[2])
            continue
        csum = c3_list[0]
        for c in c3_list[1:]:
            csum = csum + c
        if src_stack is not None:
            csum = csum + 0.5 * dt * src_stack
        lo_f = lo1[d] + csum
        hi_f = hi1[d] + shift_p(csum, ax)
        lo_f, hi_f = jax.lax.optimization_barrier((lo_f, hi_f))
        pre[d] = (lo_f, hi_f)
        out[d] = riem(lo_f, hi_f, advl[d])
    faces = tuple(out.get(d) for d in range(ndim))
    if return_pre_riemann:
        return faces, tuple(pre.get(d) for d in range(ndim))
    return faces


def flux_divergence_batched(face_states: Sequence, adv_vel: Sequence,
                            geo: LevelGeometry):
    """Conservative update for a batch: face_states[d] is (B,)+padded
    face-indexed; adv_vel[d] is the unbatched padded advecting velocity.
    Returns (B,)+valid cells."""
    grid = geo.grid
    out = None
    for d in range(grid.ndim):
        ax = grid.axis(d) + 1
        F = face_states[d] * adv_vel[d][None]
        term = (F - shift_m(F, ax)) / grid.dx[d]
        out = term if out is None else out + term
    out = _crop_cells(out, grid, ADVECT_GROW, lead=1)
    return out * geo.Jinv


def riemann_batched(pre_states, adv_vel, upwind: bool = True):
    """Final Riemann upwinding of batched padded (lo, hi) pre-states
    against the (unbatched padded) advecting velocity."""
    riem = _riemann if upwind else _riemann_avg
    return tuple(
        riem(lo, hi, adv_vel[d][None])
        for d, (lo, hi) in enumerate(pre_states))
