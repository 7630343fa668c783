"""Mapped-grid finite-volume stencil operators (div / grad / curl).

Re-design of the reference's DivCurlGrad layer
(`/root/reference/src/calculus/DivCurlGrad/`): the 25 Fortran kernels
(MAPPEDFLUXDIVERGENCE*, MAPPEDMACGRAD[ORTHO], CCGRADFC*, DONEFORMCC, ...)
become a handful of shift-and-scale expressions that XLA fuses; the
ortho ("diagonal metric") fast path is selected at trace time from
LevelGeometry.is_diagonal.

Conventions:
  * CC scalar fields: shape grid.shape (vertical-major).
  * MAC flux fields: tuple over logical dir d of arrays on fc_shape(d);
    a "flux" is the J-scaled contravariant component J u^d (so divergence
    is exactly the FV sum of face differences).
  * All operators take unpadded interior fields plus the FieldBCs needed
    to manufacture ghosts (pad-and-fill; XLA fuses the pad into the
    consumer stencil).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from somar_tpu.core.bc import BCType, FieldBCs, fill_ghosts_cc
from somar_tpu.core.grid import Grid
from somar_tpu.geometry.level_geometry import LevelGeometry


# --------------------------------------------------------------------------
# slicing helpers
# --------------------------------------------------------------------------
def slc(arr, ax: int, lo: int, hi: int | None):
    s = [slice(None)] * arr.ndim
    s[ax] = slice(lo, hi)
    return arr[tuple(s)]


def slc_idx(ndim: int, ax: int, idx: int):
    """Index tuple selecting plane `idx` along axis ax."""
    s = [slice(None)] * ndim
    s[ax] = idx
    return tuple(s)


def diff_along(arr, ax: int):
    """arr[i+1] - arr[i] along axis ax (length shrinks by 1)."""
    return slc(arr, ax, 1, None) - slc(arr, ax, 0, -1)


def avg_along(arr, ax: int):
    """0.5*(arr[i+1] + arr[i]) along axis ax (length shrinks by 1)."""
    return 0.5 * (slc(arr, ax, 1, None) + slc(arr, ax, 0, -1))


# --------------------------------------------------------------------------
# same-shape shifted copies (TPU fast path).  Materialized shape-changing
# slices along the 128-lane axis relayout the whole array and defeat XLA
# fusion; stencils expressed as same-shape shifts with junk edge entries
# (cropped once, at the very end of a pipeline) run at bandwidth.  See
# physics/godunov.py for the face-indexed array convention built on these.
# --------------------------------------------------------------------------
def shift_p(a, ax: int):
    """out[i] = a[i+1]; edge junk at the last entry."""
    return jnp.concatenate([slc(a, ax, 1, None), slc(a, ax, -1, None)],
                           axis=ax)


def shift_m(a, ax: int):
    """out[i] = a[i-1]; edge junk at the first entry."""
    return jnp.concatenate([slc(a, ax, 0, 1), slc(a, ax, 0, -1)], axis=ax)


def face_avg(u, ax: int):
    """Face value at f = 0.5 (u[f] + u[f+1]), same shape as u."""
    return 0.5 * (u + shift_p(u, ax))


# --------------------------------------------------------------------------
# cell <-> face interpolation (reference: ConvertFAB / CellToEdge)
# --------------------------------------------------------------------------
def cc_to_fc(field, d: int, grid: Grid, bcs: FieldBCs):
    """2-point average of a CC field onto faces normal to logical dir d,
    including the domain-boundary faces (1 ghost layer from BCs)."""
    ax = grid.axis(d)
    ng = [0] * grid.ndim
    ng[d] = 1
    padded = fill_ghosts_cc(field, grid, bcs, ng)
    return avg_along(padded, ax)


def fc_to_cc(flux, d: int, grid: Grid):
    """2-point average of a FC field back to cell centers."""
    return avg_along(flux, grid.axis(d))


# --------------------------------------------------------------------------
# MAC gradient: F_d = sum_j J g^{dj} d_j(phi)  at faces normal to d
# (reference: Gradient.H:38, kernels MAPPEDMACGRAD / MAPPEDMACGRADORTHO)
# --------------------------------------------------------------------------
def mac_gradient(phi, geo: LevelGeometry, bcs: FieldBCs,
                 jgup_delta=None) -> Tuple:
    """jgup_delta: optional per-direction additive modification of the
    face metric, ((diag_d,)*ndim, (full_d,)*ndim | None) — used by the
    implicit-gravity AlteredMetric (reference: AlteredMetric.H:34-56,
    fill_Jgup = J(g^ij - (w^2/(1+w^2)) dxi^i/dz dxi^j/dz))."""
    # one ghost everywhere covers both normal and tangential derivatives
    p = fill_ghosts_cc(phi, geo.grid, bcs, 1)
    return mac_gradient_prepadded(p, geo, jgup_delta, bcs=bcs)


def mac_gradient_prepadded(p, geo: LevelGeometry, jgup_delta=None,
                           bcs: Optional[FieldBCs] = None) -> Tuple:
    """mac_gradient on an array already padded with ONE ghost layer on
    every side (used by the coarse-fine machinery, where ghost cells hold
    interpolated coarse data rather than BC-formula fills).

    bcs (when known): Neumann sides constrain the TOTAL co-normal flux
    Jg^{dj} d_j phi, so the off-diagonal (cross-metric) term is zeroed at
    those boundary faces — the reference sets the whole boundary flux via
    BCFluxClass (EllipticConstNeumBCFlux).  Without this the cross term
    leaks flux through solid walls, which (a) breaks the pure-Neumann
    solvability condition (sum J*L*phi != 0, leaving an irreducible
    residual floor on terrain-following metrics) and (b) un-conserves the
    projected velocity's wall-normal flux."""
    grid = geo.grid
    ndim = grid.ndim
    dx = grid.dx

    d_diag = jgup_delta[0] if jgup_delta is not None else None
    d_full = jgup_delta[1] if jgup_delta is not None else None

    fluxes = []
    for d in range(ndim):
        ax = grid.axis(d)
        # normal derivative at faces of d: strip tangential ghosts
        pn = p
        for j in range(ndim):
            if j != d:
                pn = slc(pn, grid.axis(j), 1, -1)
        dphi_n = diff_along(pn, ax) / dx[d]
        Jg_d = geo.Jgup_diag[d]
        if d_diag is not None and d_diag[d] is not None:
            Jg_d = Jg_d + d_diag[d]
        flux = Jg_d * dphi_n

        if d_full is not None or (not geo.is_diagonal and geo.Jgup_full is not None):
            # tangential derivatives averaged to the d-faces:
            # CC central derivative in j, then 2-point average along d.
            for j in range(ndim):
                if j == d:
                    continue
                coef = geo.Jgup_full[d][j] if geo.Jgup_full is not None else 0.0
                if d_full is not None and d_full[d] is not None:
                    coef = coef + d_full[d][j]
                if isinstance(coef, float) and coef == 0.0:
                    continue
                axj = grid.axis(j)
                # central derivative in j on the d-ghosted array
                pj = p
                for k in range(ndim):
                    if k != d and k != j:
                        pj = slc(pj, grid.axis(k), 1, -1)
                dphi_j = (slc(pj, axj, 2, None) - slc(pj, axj, 0, -2)) / (2.0 * dx[j])
                # pj still has ghosts along d; average to faces of d
                cross = coef * avg_along(dphi_j, ax)
                if bcs is not None:
                    n = cross.shape[ax]
                    if bcs.lo[d].type == BCType.NEUMANN:
                        cross = cross.at[slc_idx(cross.ndim, ax, 0)].set(0.0)
                    if bcs.hi[d].type == BCType.NEUMANN:
                        cross = cross.at[slc_idx(cross.ndim, ax,
                                                 n - 1)].set(0.0)
                flux = flux + cross
        fluxes.append(flux)
    return tuple(fluxes)


# --------------------------------------------------------------------------
# MAC divergence: (1/J) sum_d (F_d[hi] - F_d[lo]) / dx_d
# (reference: Divergence::levelDivergenceMAC, kernels MAPPEDFLUXDIVERGENCE*)
# --------------------------------------------------------------------------
def mac_divergence(fluxes: Sequence, geo: LevelGeometry, scale_by_Jinv: bool = True):
    grid = geo.grid
    out = None
    for d in range(grid.ndim):
        term = diff_along(fluxes[d], grid.axis(d)) / grid.dx[d]
        out = term if out is None else out + term
    if scale_by_Jinv:
        out = out * geo.Jinv
    return out


# --------------------------------------------------------------------------
# CC gradient of a CC field via face-average of the MAC gradient
# (reference: LevelCCProjector uses Gradient::levelGradientCC)
# --------------------------------------------------------------------------
def cc_gradient(phi, geo: LevelGeometry, bcs: FieldBCs):
    """Returns (ndim,)+shape array: (J g^{dj} d_j phi)/J averaged to CC —
    i.e. the contravariant gradient g^{dj} d_j phi at cell centers."""
    grid = geo.grid
    fluxes = mac_gradient(phi, geo, bcs)
    comps = [fc_to_cc(fluxes[d], d, grid) * geo.Jinv for d in range(grid.ndim)]
    return jnp.stack(comps)


# --------------------------------------------------------------------------
# CC divergence of a CC (Cartesian-basis) velocity — diagnostics
# --------------------------------------------------------------------------
def cc_divergence(vel_cart, geo: LevelGeometry, bcs_per_comp: Sequence[FieldBCs]):
    """div u = (1/J) d_d (J u^d) with u^d = einv . u_cart, via CC central
    differences (diagnostic-quality; the solver path uses mac_divergence)."""
    grid = geo.grid
    u_mapped = geo.to_mapped(vel_cart)
    out = None
    for d in range(grid.ndim):
        ax = grid.axis(d)
        f = geo.mult_by_J(u_mapped[d])
        ng = [0] * grid.ndim
        ng[d] = 1
        f = fill_ghosts_cc(f, grid, bcs_per_comp[d], ng)
        term = (slc(f, ax, 2, None) - slc(f, ax, 0, -2)) / (2.0 * grid.dx[d])
        out = term if out is None else out + term
    return out * geo.Jinv


# --------------------------------------------------------------------------
# vorticity (reference: Curl.H:43, AMRNavierStokesDerive::computeVorticity)
# --------------------------------------------------------------------------
def _cc_phys_derivs(f, geo: LevelGeometry, bcs: FieldBCs):
    """Physical-space gradient d f / d x_k at CC via the chain rule."""
    grid = geo.grid
    p = fill_ghosts_cc(f, grid, bcs, 1)
    dxi = []
    for j in range(grid.ndim):
        pj = p
        for k in range(grid.ndim):
            if k != j:
                pj = slc(pj, grid.axis(k), 1, -1)
        axj = grid.axis(j)
        dxi.append((slc(pj, axj, 2, None) - slc(pj, axj, 0, -2)) / (2.0 * grid.dx[j]))
    dxi = jnp.stack(dxi)  # d f / d xi_j
    if geo.einv_cc is None:
        return dxi
    return jnp.einsum("jk...,j...->k...", geo.einv_cc, dxi,
                      precision=jax.lax.Precision.HIGHEST)


def vorticity(vel_cart, geo: LevelGeometry, bcs_per_comp: Sequence[FieldBCs]):
    """2D: scalar omega = dv/dx - du/dz (the two in-plane dirs);
    3D: 3-component curl of the Cartesian velocity."""
    ndim = geo.grid.ndim
    grads = [
        _cc_phys_derivs(vel_cart[m], geo, bcs_per_comp[m]) for m in range(ndim)
    ]  # grads[m][k] = d u_m / d x_k
    if ndim == 2:
        return grads[1][0] - grads[0][1]
    wx = grads[2][1] - grads[1][2]
    wy = grads[0][2] - grads[2][0]
    wz = grads[1][0] - grads[0][1]
    return jnp.stack([wx, wy, wz])
