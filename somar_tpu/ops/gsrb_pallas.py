"""Fused Pallas red-black Gauss-Seidel + residual for the uniform-metric
Helmholtz operator  L[phi] = alpha*phi + beta*lap(phi).

Why this exists: the jnp GSRB path (solvers/poisson_op.py) computes a full
residual per HALF sweep via ghost-pad + mac_gradient + mac_divergence.  On
TPU the +2-lane pad relayouts the whole array and the shift diamonds defeat
fusion — measured ~2 ms per sweep at 512x128x128 on v5e against a ~0.13 ms
HBM floor (tools/bench_profile.py).  One fused kernel does the red half and
the black half (reading red-updated neighbors from VMEM) in a single HBM
round trip.  Reference hot loop being replaced: GSRBITER* / GSRBBOUNDARYITER*
(/root/reference/src/calculus/AMRElliptic/GSRBF.ChF, 2042 LoC).

Scope (feature-detected; callers fall back to the jnp path otherwise):
  * uniform scalar metric (CartesianMap fast path: J = Jinv = Jgup = 1);
  * homogeneous BCs in {PERIODIC, DIRICHLET, NEUMANN, CF, EXTRAP order 0} —
    exactly the set whose ghost formulas reduce to a boundary-face coupling
    factor with no ghost-neighbor term, so the kernel reproduces
    fill_ghosts_cc + mac_gradient + mac_divergence to roundoff:
      DIRICHLET  ghost = -c      -> face flux 2c/dx,  factor 2, no neighbor
      NEUMANN    ghost = +c      -> face flux 0,      factor 0
      CF (hom)   ghost = 0       -> face flux c/dx,   factor 1, no neighbor
      EXTRAP(0)  ghost = c       -> face flux 0,      factor 0
      PERIODIC   wrap            -> factor 1, wrapped neighbor
  * no jgup_delta (the IG altered metric carries array coefficients).

Two variants, chosen by size:
  small  whole arrays VMEM-resident, one kernel instance, ALL `iters`
         sweeps inside the kernel (one HBM round trip per relax call) —
         this is what makes coarse MG levels nearly free;
  slab   grid over axis-0 slabs; halo planes (2 per side for the RB
         dependency cone, 1 for the residual) are pre-assembled by XLA as
         small side inputs so every input is a pipelined Pallas block (no
         manual DMA stalls).  One full RB sweep per call.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from somar_tpu.core.bc import BCType, FieldBCs
from somar_tpu.core.grid import Grid

#: VMEM working-set budget (bytes) for variant selection (the Mosaic
#: scoped-vmem limit is 16M; leave headroom); tests shrink it to force
#: the slab path on small grids.
import os as _os
_VMEM_BUDGET = int(_os.environ.get("SOMAR_GSRB_VMEM", 15 * 1024 * 1024))

_FACTOR = {BCType.DIRICHLET: 2.0, BCType.NEUMANN: 0.0, BCType.CF: 1.0}


def _bc_factor(bc) -> Optional[float]:
    if bc.type == BCType.PERIODIC:
        return 1.0
    if bc.type == BCType.EXTRAP:
        return 0.0 if bc.order == 0 else None
    return _FACTOR.get(bc.type)


class FusedPlan:
    """Static per-(grid, BCs) data for the fused kernels.

    Per ARRAY axis a (vertical-major layout): the face coefficient
    coef[a] = 1/dx_d^2 (uniform metric: Jinv*Jgup = 1), periodicity, and
    the lo/hi boundary-face factors.
    """

    def __init__(self, grid: Grid, bcs: FieldBCs):
        self.ok = False
        nd = grid.ndim
        if nd < 2:
            # Mosaic has no 1D vector layout (tpu.dynamic_rotate on a
            # vector<Nxf32> is "Unsupported 1D shape"); 1D grids (the
            # leptic solver's flattened horizontal problem in 2D) take
            # the jnp relaxation path
            return
        coef, periodic, flo, fhi = [], [], [], []
        for a in range(nd):
            d = grid.dir_of_axis(a)
            coef.append(1.0 / (grid.dx[d] ** 2))
            bc_per = bcs.lo[d].type == BCType.PERIODIC
            if bc_per != (bcs.hi[d].type == BCType.PERIODIC):
                return
            if bc_per and not grid.periodic[d]:
                return  # BC wraps but the kernel would not
            periodic.append(bc_per)
            lo = _bc_factor(bcs.lo[d])
            hi = _bc_factor(bcs.hi[d])
            if lo is None or hi is None:
                return
            flo.append(lo)
            fhi.append(hi)
        self.coef = tuple(coef)
        self.periodic = tuple(periodic)
        self.flo = tuple(flo)
        self.fhi = tuple(fhi)
        self.shape = grid.shape
        self.ndim = nd
        # variant selection
        # tile-padded footprint (lane dim -> 128, sublane dim -> 8):
        # logical bytes under-count VMEM by up to ~2x at odd sizes
        from somar_tpu.ops.stencil_gsrb_pallas import _padded_cells
        ncell = _padded_cells(grid.shape)
        if 14 * 4 * ncell <= _VMEM_BUDGET:
            self.mode = "small"
        elif nd == 3 and not self.periodic[0]:
            bz = self._pick_bz(grid.shape)
            if bz is None:
                return
            self.mode = "slab"
            self.bz = bz
        else:
            return
        self.ok = True

    def _pick_bz(self, shape) -> Optional[int]:
        nz, ny, nx = shape
        plane = 4 * ((ny + 7) // 8 * 8) * ((nx + 127) // 128 * 128)
        # empirical Mosaic live-set model for the vectorized kernel:
        # ~4 window-sized buffers (window = bz + 2*hw + double-buffer
        # slack); measured 23.4M at bz=16 W=20 on (128,128,512) vs the
        # 16M scoped-vmem limit, and bz=8 (14.7M by this model) compiles
        for bz in range(min(nz // 2, 16), 1, -1):
            if nz % bz == 0 and 4 * plane * (bz + 6) <= _VMEM_BUDGET:
                return bz
        return None


def make_plan(grid: Grid, bcs: FieldBCs, geo=None) -> Optional[FusedPlan]:
    """FusedPlan or None.  geo (LevelGeometry) gates on uniform metric."""
    if geo is not None and not geo.is_uniform:
        return None
    plan = FusedPlan(grid, bcs)
    return plan if plan.ok else None


# --------------------------------------------------------------------------
# in-kernel pieces (plane/array values with iota masks)
# --------------------------------------------------------------------------
def _nbr(p, axis: int, sign: int, periodic: bool, idx):
    """Neighbor gather along `axis`: value of p at index+sign, zero outside
    the domain for non-periodic axes.  idx: broadcasted iota along axis."""
    n = p.shape[axis]
    r = pltpu.roll(p, (n - sign) % n, axis=axis)
    if periodic:
        return r
    edge = (idx == (n - 1)) if sign > 0 else (idx == 0)
    return jnp.where(edge, 0.0, r)


def _w_lo_hi(idx, n, lo, hi, periodic: bool):
    """Per-cell (w_lo, w_hi) boundary-face coupling factors along one axis
    (1 interior; the BC factor on the domain-edge cells).  The Laplacian
    term along the axis is  coef * (w_hi*(nbr_hi - p) - w_lo*(p - nbr_lo))
    — differences FIRST, matching the jnp flux form's f32 cancellation
    structure (the gather form n_sum + diag*p cancels O(coef*|phi|) terms
    and its roundoff floor stalls MG on anisotropic grids)."""
    if periodic:
        return 1.0, 1.0
    wlo = jnp.where(idx == 0, lo, 1.0) if lo != 1.0 else 1.0
    whi = jnp.where(idx == n - 1, hi, 1.0) if hi != 1.0 else 1.0
    return wlo, whi


# --------------------------------------------------------------------------
# small variant: whole arrays in VMEM, iters sweeps per call
# --------------------------------------------------------------------------
def _small_kernel(scal_ref, phi_ref, rhs_ref, out_ref, *, plan: FusedPlan,
                  iters: int, weight: float, residual_only: bool):
    alpha = scal_ref[0]
    beta = scal_ref[1]
    nd = plan.ndim
    shape = plan.shape
    iotas = [jax.lax.broadcasted_iota(jnp.int32, shape, a) for a in range(nd)]

    # boundary factors, diag and parity are loop-invariant
    ws = [_w_lo_hi(iotas[a], shape[a], plan.flo[a], plan.fhi[a],
                   plan.periodic[a]) for a in range(nd)]
    diag = jnp.zeros(shape, phi_ref.dtype)
    for a in range(nd):
        diag = diag - plan.coef[a] * (ws[a][0] + ws[a][1])
    parity = iotas[0]
    for a in range(1, nd):
        parity = parity + iotas[a]
    red = (parity % 2) == 0

    def lap_of(p):
        lap = jnp.zeros(shape, p.dtype)
        for a in range(nd):
            hi = _nbr(p, a, +1, plan.periodic[a], iotas[a])
            lo = _nbr(p, a, -1, plan.periodic[a], iotas[a])
            lap = lap + plan.coef[a] * (ws[a][1] * (hi - p)
                                        - ws[a][0] * (p - lo))
        return lap

    rhs = rhs_ref[...]
    if residual_only:
        p = phi_ref[...]
        out_ref[...] = rhs - alpha * p - beta * lap_of(p)
        return

    inv_den = weight / (alpha + beta * diag)

    def half(p, mask):
        r = rhs - alpha * p - beta * lap_of(p)
        return jnp.where(mask, p + inv_den * r, p)

    def body(_, p):
        return half(half(p, red), jnp.logical_not(red))

    out_ref[...] = jax.lax.fori_loop(0, iters, body, phi_ref[...])


def _run_small(plan: FusedPlan, phi, rhs, alpha, beta, iters, weight,
               residual_only, interpret):
    kern = functools.partial(_small_kernel, plan=plan, iters=iters,
                             weight=weight, residual_only=residual_only)
    scal = jnp.stack([jnp.asarray(alpha, phi.dtype),
                      jnp.asarray(beta, phi.dtype)])
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(phi.shape, phi.dtype),
        interpret=interpret,
    )(scal, phi, rhs)


# --------------------------------------------------------------------------
# slab variant: grid over axis-0 slabs, XLA-preassembled halo planes
# --------------------------------------------------------------------------
def _halo(arr, bz: int, width: int):
    """Per-slab halo planes: lo[i] = arr planes [i*bz-width, i*bz) and
    hi[i] = [(i+1)*bz, (i+1)*bz+width), zero outside the domain.  Shapes
    (nslab, width, ny, nx) — tiny strided slices of arr."""
    nz = arr.shape[0]
    nslab = nz // bz
    r = arr.reshape((nslab, bz) + arr.shape[1:])
    zero = jnp.zeros((1, width) + arr.shape[1:], arr.dtype)
    lo = jnp.concatenate([zero, r[:-1, bz - width:]], axis=0)
    hi = jnp.concatenate([r[1:, :width], zero], axis=0)
    return lo, hi


def _slab_kernel(scal_ref, phi_ref, hm_ref, hp_ref, rhs_ref, rm_ref, rp_ref,
                 out_ref, *, plan: FusedPlan, weight: float,
                 residual_only: bool):
    """One full RB sweep (or residual) on slab i of bz planes.

    Fully vectorized over the extended window [halo_lo | slab | halo_hi]
    (no per-plane loop, no dynamic VMEM indexing — Mosaic pipelines whole-
    block vector ops far better): the red half-update runs on the whole
    window (one plane into each halo so the black half sees red-updated
    z-neighbors), then the black half, then the slab interior is written
    out."""
    alpha = scal_ref[0]
    beta = scal_ref[1]
    nz, ny, nx = plan.shape
    bz = plan.bz
    hw = 1 if residual_only else 2
    W = bz + 2 * hw
    i = pl.program_id(0)
    z0 = i * bz

    w = jnp.concatenate([hm_ref[0], phi_ref[...], hp_ref[0]], axis=0)
    rw = jnp.concatenate([rm_ref[0], rhs_ref[...], rp_ref[0]], axis=0)
    if hw == 2:
        # rhs window carries 1 halo plane/side; pad to the phi window
        zpad = jnp.zeros((1, ny, nx), rw.dtype)
        rw = jnp.concatenate([zpad, rw, zpad], axis=0)

    # masks at minimal rank ((W,1,1) z-varying, (ny,nx) in-plane) so the
    # broadcasts happen at use sites instead of materializing full-window
    # temporaries in VMEM
    iz = jax.lax.broadcasted_iota(jnp.int32, (W, 1, 1), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    zg = iz + (z0 - hw)                   # global z index per plane
    cz, cy, cx = plan.coef
    wylo, wyhi = _w_lo_hi(iy, ny, plan.flo[1], plan.fhi[1], plan.periodic[1])
    wxlo, wxhi = _w_lo_hi(ix, nx, plan.flo[2], plan.fhi[2], plan.periodic[2])
    wzlo = jnp.where(zg == 0, plan.flo[0], 1.0)
    wzhi = jnp.where(zg == nz - 1, plan.fhi[0], 1.0)
    diag = -(cy * (wylo + wyhi) + cx * (wxlo + wxhi)
             + cz * (wzlo + wzhi))
    valid = (zg >= 0) & (zg < nz)
    parity = (ix + iy + zg) % 2

    def resid(p):
        yhi = _nbr(p, 1, +1, plan.periodic[1], iy)
        ylo = _nbr(p, 1, -1, plan.periodic[1], iy)
        xhi = _nbr(p, 2, +1, plan.periodic[2], ix)
        xlo = _nbr(p, 2, -1, plan.periodic[2], ix)
        # z: window-internal shifts; halo planes are zero outside the
        # domain and the boundary factor handles domain-edge coupling
        zhi = _nbr(p, 0, +1, False, iz)
        zlo = _nbr(p, 0, -1, False, iz)
        lap = (cy * (wyhi * (yhi - p) - wylo * (p - ylo))
               + cx * (wxhi * (xhi - p) - wxlo * (p - xlo))
               + cz * (wzhi * (zhi - p) - wzlo * (p - zlo)))
        return rw - alpha * p - beta * lap

    if residual_only:
        out_ref[...] = resid(w)[hw:hw + bz]
        return

    inv_den = weight / (alpha + beta * diag)

    def half(p, par):
        mask = jnp.logical_and(parity == par, valid)
        return jnp.where(mask, p + inv_den * resid(p), p)

    w = half(half(w, 0), 1)
    out_ref[...] = w[hw:hw + bz]


def _run_slab(plan: FusedPlan, phi, rhs, alpha, beta, weight,
              residual_only, interpret, rhs_halo=None):
    bz = plan.bz
    nz, ny, nx = plan.shape
    nslab = nz // bz
    hw = 1 if residual_only else 2
    hm, hp = _halo(phi, bz, hw)
    rm, rp = rhs_halo if rhs_halo is not None else _halo(rhs, bz, 1)
    scal = jnp.stack([jnp.asarray(alpha, phi.dtype),
                      jnp.asarray(beta, phi.dtype)])

    def hblk(w):
        return pl.BlockSpec((1, w, ny, nx), lambda i: (i, 0, 0, 0))

    sblk = pl.BlockSpec((bz, ny, nx), lambda i: (i, 0, 0))
    kern = functools.partial(_slab_kernel, plan=plan, weight=weight,
                             residual_only=residual_only)
    return pl.pallas_call(
        kern,
        grid=(nslab,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  sblk, hblk(hw), hblk(hw), sblk, hblk(1), hblk(1)],
        out_specs=sblk,
        out_shape=jax.ShapeDtypeStruct(phi.shape, phi.dtype),
        interpret=interpret,
    )(scal, phi, hm, hp, rhs, rm, rp)


# --------------------------------------------------------------------------
# public entry points
# --------------------------------------------------------------------------
def _auto_interpret(interpret):
    """interpret=None -> interpret off TPU (SOMAR_FUSED_GSRB=1 on CPU
    exercises the kernels through the Pallas interpreter)."""
    if interpret is not None:
        return interpret
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def gsrb_sweeps(plan: FusedPlan, phi, rhs, alpha, beta, iters: int,
                weight: float = 1.0, interpret=None):
    """`iters` full red-black sweeps of the uniform-metric Helmholtz
    smoother; equivalent to PoissonOp.relax_gsrb on the supported BC set
    (asserted to roundoff in tests/test_gsrb_pallas.py)."""
    interpret = _auto_interpret(interpret)
    if plan.mode == "small":
        return _run_small(plan, phi, rhs, alpha, beta, iters, weight,
                          False, interpret)

    rhs_halo = _halo(rhs, plan.bz, 1)   # loop-invariant: assemble once

    def body(_, p):
        return _run_slab(plan, p, rhs, alpha, beta, weight, False,
                         interpret, rhs_halo=rhs_halo)

    return jax.lax.fori_loop(0, iters, body, phi)


def helm_residual(plan: FusedPlan, phi, rhs, alpha, beta,
                  interpret=None):
    """rhs - (alpha*phi + beta*lap(phi)), homogeneous BCs."""
    interpret = _auto_interpret(interpret)
    if plan.mode == "small":
        return _run_small(plan, phi, rhs, alpha, beta, 0, 1.0, True,
                          interpret)
    return _run_slab(plan, phi, rhs, alpha, beta, 1.0, True, interpret)
