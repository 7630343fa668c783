"""Fused Pallas red-black Gauss-Seidel + residual for the MAPPED-metric
Helmholtz operator  L[phi] = alpha*phi + beta*Jinv*div(Jgup grad phi).

ops/gsrb_pallas.py covers the uniform-metric (Cartesian) fast path; this
module covers everything else on a level with CONCRETE geometry — diagonal
array coefficients (stretched/cylindrical maps) and full non-diagonal Jgup
(terrain-following BathymetricBaseMap/BeamGeneratorMap metrics, the
reference's general GSRBITER* path vs the *ORTHO fast path,
/root/reference/src/calculus/AMRElliptic/GSRBF.ChF).

Design: instead of re-deriving every BC/ghost/cross-term fold by hand, the
operator's exact interior stencil is EXTRACTED once at setup by probing the
existing jnp operator with lattice-coloring indicator fields:

    W_o[c] = Lambda[chi_{color(c+o)}][c]

where Lambda = apply(alpha=0, beta=1, homogeneous) and the coloring modulus
per axis (3, or 4 on periodic axes whose size is not divisible by 3) makes
every offset in the 3^nd neighborhood color-distinct.  Ghost-formula folds
(Dirichlet mirror, Neumann zero-flux, extrap, CF-homogeneous) and the
non-diagonal cross-term quirks (Neumann cross zeroing, corner ghosts) are
baked into the probed weights by construction, so the kernel reproduces the
jnp operator to roundoff — asserted on random fields at setup; any stencil
the probe cannot represent (e.g. order>=1 extrapolation reaching offset 2)
fails validation and falls back to the jnp path.

Numerics: the kernel evaluates the DIFFERENCE form

    lap[c] = sum_{o != 0} W_o[c] * (phi[c+o] - phi[c]) + R[c] * phi[c]

with the row-sum R = Lambda[1] probed from the jnp flux-difference path
(exactly zero on Neumann/periodic problems), preserving the f32
cancellation structure — the gather form's O(W*|phi|) roundoff floor
stalls MG on anisotropic metrics (see ops/gsrb_pallas.py).

Out-of-domain neighbors need no masking: an offset pointing outside the
domain lands on a color whose in-range stencil support is empty, so its
probed weight is exactly zero.

Two variants, chosen by size (mirroring gsrb_pallas):
  small  whole arrays + weights VMEM-resident, ALL sweeps in one kernel;
  slab   grid over axis-0 slabs with pre-assembled halo planes; one full
         RB sweep per call (weight/rhs halos hoisted out of the sweep
         loop).
"""

from __future__ import annotations

import functools
import itertools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: VMEM working-set budget (bytes); tests shrink it to force the slab path.
import os as _os
_VMEM_BUDGET = int(_os.environ.get("SOMAR_GSRB_VMEM", 15 * 1024 * 1024))


def _is_concrete(*arrays) -> bool:
    for a in arrays:
        if a is None:
            continue
        if isinstance(a, jax.core.Tracer):
            return False
    return True


# --------------------------------------------------------------------------
# stencil extraction by lattice-coloring probes
# --------------------------------------------------------------------------
def _moduli(shape, periodic) -> Optional[Tuple[int, ...]]:
    mods = []
    for n, per in zip(shape, periodic):
        if n < 3:
            return None
        if not per:
            mods.append(3)
        elif n % 3 == 0:
            mods.append(3)
        elif n % 4 == 0:
            mods.append(4)
        else:
            return None
    return tuple(mods)


def probe_stencil(apply_fn, shape, periodic, dtype=jnp.float32):
    """Extract the interior stencil of a linear operator with support in
    the 3^nd neighborhood.  Returns (offsets, Wn, R) where offsets is a
    tuple of nonzero offset tuples (zero-weight offsets pruned), Wn is the
    stacked weight array (K,)+shape with out[c] weighting phi[c+offset],
    and R is the exact row sum apply(ones); or None when no valid coloring
    exists."""
    mods = _moduli(shape, periodic)
    if mods is None:
        return None
    nd = len(shape)
    idx = [jax.lax.broadcasted_iota(jnp.int32, shape, a) for a in range(nd)]
    strides = []
    s = 1
    for m in mods[::-1]:
        strides.append(s)
        s *= m
    strides = strides[::-1]
    ncolors = s

    def color_of(offsets):
        c = jnp.zeros(shape, jnp.int32)
        for a in range(nd):
            c = c + ((idx[a] + offsets[a]) % mods[a]) * strides[a]
        return c

    base_color = color_of((0,) * nd)
    ys = []
    for v in range(ncolors):
        chi = (base_color == v).astype(dtype)
        ys.append(apply_fn(chi))
    Y = jnp.stack(ys)                      # (ncolors,) + shape

    offsets, ws = [], []
    for off in itertools.product((-1, 0, 1), repeat=nd):
        if all(o == 0 for o in off):
            continue
        col = color_of(off)
        w = jnp.take_along_axis(Y, col[None], axis=0)[0]
        if not bool(jnp.any(w != 0.0)):
            continue
        offsets.append(off)
        ws.append(w)
    R = apply_fn(jnp.ones(shape, dtype))
    if not offsets:
        return (), jnp.zeros((0,) + tuple(shape), dtype), R
    return tuple(offsets), jnp.stack(ws), R


def _ru(v: int, m: int) -> int:
    return -(-v // m) * m


def _padded_cells(shape) -> int:
    """VMEM cells a buffer of `shape` actually occupies: Mosaic rounds the
    lane (last) dim up to 128 and the sublane (second-to-last) dim up to
    8.  Budgeting LOGICAL bytes under-counts by up to ~2x at odd domain
    sizes (e.g. 136 lanes occupy 256) — the round-3 scoped-VMEM OOM that
    killed the AMR bench came from exactly that (same rule as
    ops/pallas_kernels._plan_blocking's bytes_of)."""
    nd = len(shape)
    n = 1
    for i, v in enumerate(shape):
        if i == nd - 1:
            v = _ru(v, 128)
        elif i == nd - 2:
            v = _ru(v, 8)
        n *= v
    return n


class StencilPlan:
    """Probed-stencil data for the fused mapped GSRB/residual kernels."""

    def __init__(self, offsets, Wn, R, D, shape, periodic):
        self.offsets = offsets          # K nonzero offsets (array axes)
        self.Wn = Wn                    # (K,) + shape neighbor weights
        self.R = R                      # row sum, shape
        self.D = D                      # smoother diagonal = op.diag(0,1)
        self.shape = tuple(shape)
        self.periodic = tuple(periodic)
        self.ndim = len(shape)
        self.K = len(offsets)
        if self.ndim < 2:
            # Mosaic has no 1D vector layout (pltpu.roll on a 1D block
            # fails "Unsupported 1D shape"); 1D grids take the jnp path
            self.ok = False
            return
        ncell = _padded_cells(shape)
        # small: phi/rhs/out + K+1 weights + temporaries + Mosaic's
        # double-buffered operand copies.  Calibrated against a measured
        # Mosaic stack allocation: 17.57M at K=6 on a padded
        # 32x48x128 block = 22.3 buffer-equivalents, i.e. ~K+16 live
        # buffers — the old K+10 model under-counted by ~6 and scoped-VMEM
        # OOMed the 512-class AMR bench inside MG relax
        if 4 * ncell * (self.K + 17) <= _VMEM_BUDGET:
            self.mode = "small"
            self.ok = True
        elif not self.periodic[0] and shape[0] >= 8:
            bz = self._pick_bz(shape)
            self.ok = bz is not None
            self.mode = "slab"
            self.bz = bz
        else:
            self.ok = False

    def _pick_bz(self, shape) -> Optional[int]:
        # tile-padded bytes of one (window,)+rest block; in 2D the slab
        # axis itself is the sublane dim, in 3D+ the padding falls on the
        # trailing two axes of `rest`
        rest = list(shape[1:])
        pad_win = (lambda w: _ru(w, 8)) if len(rest) == 1 else (lambda w: w)
        rest[-1] = _ru(rest[-1], 128)
        if len(rest) >= 2:
            rest[-2] = _ru(rest[-2], 8)
        plane = 4
        for n in rest:
            plane *= n
        # live set ~ (K + 6) window-sized buffers + pipeline slack
        for bz in range(min(shape[0] // 2, 32), 1, -1):
            if shape[0] % bz == 0 and \
                    (self.K + 8) * plane * pad_win(bz + 6) <= _VMEM_BUDGET:
                return bz
        return None


def build_stencil_plan(op, validate: bool = True) -> Optional[StencilPlan]:
    """StencilPlan for a PoissonOp's homogeneous Lambda (alpha=0, beta=1,
    no jgup_delta), or None when the geometry is traced, no coloring
    exists, the stencil exceeds the 3^nd box (validation), or neither
    kernel variant fits VMEM."""
    geo = op.geo
    if not _is_concrete(geo.J, geo.Jinv, *list(geo.Jgup_diag)):
        return None
    grid = op.grid
    per = [grid.periodic[grid.dir_of_axis(a)] for a in range(grid.ndim)]

    def lam(x):
        return op.apply(x, 0.0, 1.0, homogeneous=True)

    got = probe_stencil(lam, grid.shape, per)
    if got is None:
        return None
    offsets, Wn, R = got
    # smoother denominator: the op's OWN diagonal (FILLMAPPEDLAPDIAG
    # analog — ignores cross terms), NOT the probed row-center weight:
    # relax parity with PoissonOp.relax_gsrb requires the same inv_diag
    plan = StencilPlan(offsets, Wn, R, op.diag(0.0, 1.0), grid.shape, per)
    if not plan.ok:
        return None
    if validate:
        rng = np.random.default_rng(12345)
        x = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
        want = lam(x)
        gotx = _apply_reference(plan, x)
        scale = float(jnp.max(jnp.abs(want))) + 1e-30
        if float(jnp.max(jnp.abs(gotx - want))) > 1e-4 * scale:
            return None
    return plan


def _roll_to(p, off):
    """out[c] = p[c + off] with wrap (junk wraps hit zero weights on
    non-periodic axes)."""
    out = p
    for a, o in enumerate(off):
        if o:
            out = jnp.roll(out, -o, axis=a)
    return out


def _apply_reference(plan: StencilPlan, phi):
    """jnp reconstruction of Lambda from the plan (validation only)."""
    lap = plan.R * phi
    for k, off in enumerate(plan.offsets):
        lap = lap + plan.Wn[k] * (_roll_to(phi, off) - phi)
    return lap


# --------------------------------------------------------------------------
# in-kernel pieces
# --------------------------------------------------------------------------
def _k_roll(p, off):
    """In-kernel neighbor gather out[c] = p[c+off] (pltpu.roll wraps;
    non-periodic edges rely on zero weights)."""
    out = p
    for a, o in enumerate(off):
        if o:
            n = out.shape[a]
            out = pltpu.roll(out, (n - o) % n, axis=a)
    return out


def _lap_of(p, wn, r, offsets):
    lap = r * p
    for k, off in enumerate(offsets):
        lap = lap + wn[k] * (_k_roll(p, off) - p)
    return lap


# --------------------------------------------------------------------------
# small variant
# --------------------------------------------------------------------------
def _small_kernel(scal_ref, phi_ref, rhs_ref, wn_ref, r_ref, w0_ref,
                  out_ref, *, plan: StencilPlan, iters: int, weight: float,
                  residual_only: bool):
    alpha = scal_ref[0]
    beta = scal_ref[1]
    shape = plan.shape
    wn = wn_ref[...]
    r = r_ref[...]
    rhs = rhs_ref[...]

    if residual_only:
        p = phi_ref[...]
        out_ref[...] = rhs - alpha * p - beta * _lap_of(p, wn, r,
                                                        plan.offsets)
        return

    parity = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    for a in range(1, plan.ndim):
        parity = parity + jax.lax.broadcasted_iota(jnp.int32, shape, a)
    red = (parity % 2) == 0
    inv_den = weight / (alpha + beta * w0_ref[...])

    def half(p, mask):
        res = rhs - alpha * p - beta * _lap_of(p, wn, r, plan.offsets)
        return jnp.where(mask, p + inv_den * res, p)

    def body(_, p):
        return half(half(p, red), jnp.logical_not(red))

    out_ref[...] = jax.lax.fori_loop(0, iters, body, phi_ref[...])


def _run_small(plan: StencilPlan, phi, rhs, w0, alpha, beta, iters, weight,
               residual_only, interpret, Wn=None, R=None):
    kern = functools.partial(_small_kernel, plan=plan, iters=iters,
                             weight=weight, residual_only=residual_only)
    scal = jnp.stack([jnp.asarray(alpha, phi.dtype),
                      jnp.asarray(beta, phi.dtype)])
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vspec] * 5,
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct(phi.shape, phi.dtype),
        interpret=interpret,
    )(scal, phi, rhs,
      plan.Wn if Wn is None else Wn,
      plan.R if R is None else R, w0)


# --------------------------------------------------------------------------
# slab variant (3D or tall 2D, non-periodic axis 0)
# --------------------------------------------------------------------------
def _halo(arr, bz: int, width: int):
    """Per-slab axis-0 halo planes (see ops/gsrb_pallas._halo)."""
    n0 = arr.shape[0]
    nslab = n0 // bz
    r = arr.reshape((nslab, bz) + arr.shape[1:])
    zero = jnp.zeros((1, width) + arr.shape[1:], arr.dtype)
    lo = jnp.concatenate([zero, r[:-1, bz - width:]], axis=0)
    hi = jnp.concatenate([r[1:, :width], zero], axis=0)
    return lo, hi


def _win(ref, lo_ref, hi_ref):
    return jnp.concatenate([lo_ref[0], ref[...], hi_ref[0]], axis=0)


def _slab_kernel(scal_ref, phi_ref, pm_ref, pp_ref, rhs_ref, rm_ref, rp_ref,
                 wn_ref, wm_ref, wp_ref, r_ref, sm_ref, sp_ref,
                 w0_ref, dm_ref, dp_ref, out_ref, *,
                 plan: StencilPlan, weight: float, residual_only: bool):
    """One full RB sweep (or residual) on slab i: the red half updates one
    plane into each halo so the black half sees red-updated axis-0
    neighbors (same window scheme as gsrb_pallas._slab_kernel)."""
    alpha = scal_ref[0]
    beta = scal_ref[1]
    n0 = plan.shape[0]
    bz = plan.bz
    hw = 1 if residual_only else 2
    i = pl.program_id(0)
    z0 = i * bz

    w = _win(phi_ref, pm_ref, pp_ref)
    rw = _win(rhs_ref, rm_ref, rp_ref)
    if hw == 2:
        zpad = jnp.zeros((1,) + rw.shape[1:], rw.dtype)
        rw = jnp.concatenate([zpad, rw, zpad], axis=0)
    wn = jnp.concatenate([wm_ref[0], wn_ref[...], wp_ref[0]], axis=1)
    r = _win(r_ref, sm_ref, sp_ref)

    W = bz + 2 * hw
    iz = jax.lax.broadcasted_iota(
        jnp.int32, (W,) + (1,) * (plan.ndim - 1), 0)
    zg = iz + (z0 - hw)
    valid = (zg >= 0) & (zg < n0)

    def resid(p):
        return rw - alpha * p - beta * _lap_of(p, wn, r, plan.offsets)

    if residual_only:
        out_ref[...] = resid(w)[hw:hw + bz]
        return

    dw = jnp.concatenate([dm_ref[0], w0_ref[...], dp_ref[0]], axis=0)
    inv_den = weight / (alpha + beta * dw)
    parity = zg
    for a in range(1, plan.ndim):
        shp = [1] * plan.ndim
        shp[a] = plan.shape[a]
        parity = parity + jax.lax.broadcasted_iota(jnp.int32, tuple(shp), a)
    parity = parity % 2

    def half(p, par):
        mask = jnp.logical_and(parity == par, valid)
        return jnp.where(mask, p + inv_den * resid(p), p)

    w = half(half(w, 0), 1)
    out_ref[...] = w[hw:hw + bz]


class _SlabAux:
    """Loop-invariant pre-assembled slab inputs (weights/rhs/W0 halos)."""

    def __init__(self, plan, rhs, w0, residual_only, Wn=None, R=None):
        bz = plan.bz
        hw = 1 if residual_only else 2
        Wn = plan.Wn if Wn is None else Wn
        R = plan.R if R is None else R
        self.Wn, self.R = Wn, R
        self.rm, self.rp = _halo(rhs, bz, 1)
        # weight halos: assembled over the K axis at once (axis 0 of Wn is
        # the offset index; slab axis is 1)
        wm, wp = [], []
        for k in range(plan.K):
            a, b = _halo(Wn[k], bz, hw)
            wm.append(a)
            wp.append(b)
        self.wm = (jnp.stack(wm, axis=1) if plan.K else
                   jnp.zeros((rhs.shape[0] // bz, 0, hw) + rhs.shape[1:]))
        self.wp = (jnp.stack(wp, axis=1) if plan.K else self.wm)
        self.sm, self.sp = _halo(R, bz, hw)
        if not residual_only:
            self.dm, self.dp = _halo(w0, bz, hw)
        else:
            self.dm, self.dp = self.sm, self.sp


def _run_slab(plan: StencilPlan, phi, rhs, w0, alpha, beta, weight,
              residual_only, interpret, aux: Optional[_SlabAux] = None,
              Wn=None, R=None):
    bz = plan.bz
    n0 = plan.shape[0]
    rest = plan.shape[1:]
    nslab = n0 // bz
    hw = 1 if residual_only else 2
    pm, pp = _halo(phi, bz, hw)
    if aux is None:
        aux = _SlabAux(plan, rhs, w0, residual_only, Wn=Wn, R=R)
    scal = jnp.stack([jnp.asarray(alpha, phi.dtype),
                      jnp.asarray(beta, phi.dtype)])

    def hblk(w):
        return pl.BlockSpec((1, w) + rest, lambda i: (i,) + (0,) * plan.ndim)

    def whblk(w):
        return pl.BlockSpec((1, plan.K, w) + rest,
                            lambda i: (i,) + (0,) * (plan.ndim + 1))

    sblk = pl.BlockSpec((bz,) + rest, lambda i: (i,) + (0,) * (plan.ndim - 1))
    wblk = pl.BlockSpec((plan.K, bz) + rest,
                        lambda i: (0, i) + (0,) * (plan.ndim - 1))
    kern = functools.partial(_slab_kernel, plan=plan, weight=weight,
                             residual_only=residual_only)
    return pl.pallas_call(
        kern,
        grid=(nslab,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  sblk, hblk(hw), hblk(hw),          # phi + halos
                  sblk, hblk(1), hblk(1),            # rhs + halos
                  wblk, whblk(hw), whblk(hw),        # Wn + halos
                  sblk, hblk(hw), hblk(hw),          # R + halos
                  sblk, hblk(hw), hblk(hw)],         # W0 + halos
        out_specs=sblk,
        out_shape=jax.ShapeDtypeStruct(phi.shape, phi.dtype),
        interpret=interpret,
    )(scal, phi, pm, pp, rhs, aux.rm, aux.rp, aux.Wn, aux.wm, aux.wp,
      aux.R, aux.sm, aux.sp, w0, aux.dm, aux.dp)


# --------------------------------------------------------------------------
# public entry points
# --------------------------------------------------------------------------
def _auto_interpret(interpret):
    if interpret is not None:
        return interpret
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def gsrb_sweeps(plan: StencilPlan, phi, rhs, alpha, beta, iters: int,
                weight: float = 1.0, interpret=None, Wn=None, R=None,
                w0=None):
    """`iters` red-black sweeps of the probed-stencil Helmholtz smoother;
    equivalent to PoissonOp.relax_gsrb on the plan's operator (asserted to
    roundoff in tests/test_stencil_gsrb_pallas.py).

    Wn/R/w0 override the plan's probed weights / row sum / smoother
    diagonal with RUNTIME (traced) arrays — the implicit-gravity altered
    metric enters the operator linearly, so its solves pass
    plan.Wn + delta weights (delta_stencil_weights below) instead of
    falling back to the jnp path."""
    interpret = _auto_interpret(interpret)
    if w0 is None:
        w0 = plan.D
    if plan.mode == "small":
        return _run_small(plan, phi, rhs, w0, alpha, beta, iters, weight,
                          False, interpret, Wn=Wn, R=R)
    aux = _SlabAux(plan, rhs, w0, False, Wn=Wn, R=R)

    def body(_, p):
        return _run_slab(plan, p, rhs, w0, alpha, beta, weight, False,
                         interpret, aux=aux)

    return jax.lax.fori_loop(0, iters, body, phi)


def helm_residual(plan: StencilPlan, phi, rhs, alpha, beta, interpret=None,
                  Wn=None, R=None):
    """rhs - (alpha*phi + beta*Lambda(phi)) via the probed stencil."""
    interpret = _auto_interpret(interpret)
    w0 = plan.D
    if plan.mode == "small":
        return _run_small(plan, phi, rhs, w0, alpha, beta, 0, 1.0, True,
                          interpret, Wn=Wn, R=R)
    return _run_slab(plan, phi, rhs, w0, alpha, beta, 1.0, True, interpret,
                     Wn=Wn, R=R)


def delta_stencil_weights(plan: StencilPlan, op, jgup_delta):
    """Traced stencil weights of a jgup_delta contribution, evaluated
    at the plan's probed offsets (the IG altered metric enters the
    operator LINEARLY: Lambda_total = Lambda_base + Lambda_delta;
    reference: AlteredMetric.H:34-56).  Returns (dWn, dR) to add to
    plan.Wn / plan.R, or None when the plan's offset set might not
    cover the delta's support (the delta carries cross-metric terms, so
    the base plan must span the full 3^nd-1 neighborhood — true for
    non-diagonal base metrics, which is exactly where the IG projection
    runs on mapped grids).

    Runs 2*ncolors traced applications of the base operator — hoist the
    result per solve (LevelMultigrid passes it down the V-cycle), not
    per relax call."""
    shape = plan.shape
    nd = plan.ndim
    if plan.K != 3 ** nd - 1:
        return None
    mods = _moduli(shape, plan.periodic)
    if mods is None:
        return None

    def dapply(x):
        return (op.apply(x, 0.0, 1.0, homogeneous=True,
                         jgup_delta=jgup_delta)
                - op.apply(x, 0.0, 1.0, homogeneous=True))

    idx = [jax.lax.broadcasted_iota(jnp.int32, shape, a)
           for a in range(nd)]
    strides = []
    s = 1
    for m in mods[::-1]:
        strides.append(s)
        s *= m
    strides = strides[::-1]
    ncolors = s

    def color_of(offsets):
        c = jnp.zeros(shape, jnp.int32)
        for a in range(nd):
            c = c + ((idx[a] + offsets[a]) % mods[a]) * strides[a]
        return c

    base_color = color_of((0,) * nd)
    dtype = plan.Wn.dtype
    Y = jnp.stack([dapply((base_color == v).astype(dtype))
                   for v in range(ncolors)])
    dWs = [jnp.take_along_axis(Y, color_of(off)[None], axis=0)[0]
           for off in plan.offsets]
    dR = dapply(jnp.ones(shape, dtype))
    return jnp.stack(dWs), dR
