"""Semicoarsening geometric multigrid for the mapped Poisson/Helmholtz op.

Re-design of the reference's MappedMultiGrid / MappedAMRMultiGrid +
MappedAMRPoissonOpFactory (`/root/reference/src/calculus/AMRElliptic/`):

* The **semicoarsening schedule** mirrors MappedAMRPoissonOpFactory.cpp:
  476-556 — at each MG level, coarsen only the directions whose dx is at
  most half the current max dx (equalize anisotropy before coarsening
  isotropically); if none qualify, coarsen every coarsenable direction;
  stop when nothing is coarsenable.
* Restriction is block full-weighting (reference: FullWeightingPS);
  prolongation is piecewise-constant (ConstInterpPS), with the zero-average
  variant applied automatically for singular (all-Neumann/periodic)
  problems (reference: ZeroAvgConstInterpPS, ProlongationStrategy.H:52-66).
* Coarse-level metrics are re-derived from the GeoSource on the coarsened
  grid (the reference averages fine-level Jgup; re-evaluating the map is
  equivalent to truncation order and simpler).
* The V/W-cycle recursion is unrolled in Python (static per hierarchy), so
  the whole solve jits into one XLA computation; the outer iteration is a
  `lax.while_loop` on the residual norm with the reference's iter/hang/
  convergence semantics (imin/imax/eps/hang, ProblemContext AMRMG.*).

Smoother choice per level: 'gsrb' (default), 'jacobi', 'line' (vertical
tridiagonal line relaxation — use on strongly anisotropic levels).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from somar_tpu.core.bc import FieldBCs
from somar_tpu.core.grid import Grid
from somar_tpu.geometry.level_geometry import LevelGeometry, build_level_geometry
from somar_tpu.solvers.poisson_op import PoissonOp


# --------------------------------------------------------------------------
# anisotropic block transfer operators
# --------------------------------------------------------------------------
def restrict_fullweight(fine, grid_f: Grid, ratio: Sequence[int]):
    """Block average of a fine CC field onto the coarsened grid.

    ratio is per *logical* direction; array axes are vertical-major.

    TPU note: coarsen ONE axis at a time.  The single 2N-dimensional
    reshape-mean (split every axis at once) makes XLA materialize an
    interleaved relayout — measured 6.4 ms at 512x128x128 on v5e, the
    dominant V-cycle cost; the per-axis splits lower to cheap strided
    reductions (~0.3 ms total) and each halving shrinks the data for
    the next axis."""
    out = fine
    for ax in range(out.ndim):
        r = ratio[grid_f.dir_of_axis(ax)]
        if r == 1:
            continue
        shape = list(out.shape)
        shape[ax] = shape[ax] // r
        shape.insert(ax + 1, r)
        out = out.reshape(shape).mean(axis=ax + 1)
    return out


def prolong_linear_mg(coarse, grid_f: Grid, ratio: Sequence[int],
                      periodic: Sequence[bool]):
    """Unlimited piecewise-multilinear prolongation of an MG correction.

    One order higher than piecewise-constant injection (reference:
    ConstInterpPS, ProlongationStrategy.H:52) — the extra order roughly
    halves the V-cycle count on variable-coefficient metrics because the
    coarse-grid correction no longer injects O(h) staircase error for the
    smoother to clean up.  Slopes are central in the interior, wrapped on
    periodic axes, one-sided at walls; no limiter (corrections are signed
    error fields, monotonicity is meaningless for them).
    """
    out = coarse
    for ax in range(coarse.ndim):
        d = grid_f.dir_of_axis(ax)
        r = ratio[d]
        if r == 1:
            continue
        n = out.shape[ax]
        sl = lambda a, b: jax.lax.slice_in_dim(out, a, b, axis=ax)
        if n < 2:
            s = jnp.zeros_like(out)
        elif periodic[d]:
            s = 0.5 * (jnp.roll(out, -1, axis=ax) - jnp.roll(out, 1, axis=ax))
        elif n == 2:
            s = jnp.concatenate([sl(1, 2) - sl(0, 1)] * 2, axis=ax)
        else:
            s_int = 0.5 * (sl(2, n) - sl(0, n - 2))
            s = jnp.concatenate(
                [sl(1, 2) - sl(0, 1), s_int, sl(n - 1, n) - sl(n - 2, n - 1)],
                axis=ax)
        offsets = (jnp.arange(r, dtype=out.dtype) + 0.5) / r - 0.5
        oshape = [1] * (out.ndim + 1)
        oshape[ax + 1] = r
        off = offsets.reshape(oshape)
        vals = (jnp.expand_dims(out, ax + 1)
                + off * jnp.expand_dims(s, ax + 1))
        merged = list(out.shape)
        merged[ax] = merged[ax] * r
        out = vals.reshape(merged)
    return out


def prolong_const(coarse, grid_f: Grid, ratio: Sequence[int]):
    """Piecewise-constant injection of a coarse CC field onto the fine grid."""
    shape_c = coarse.shape
    axes_ratio = [ratio[grid_f.dir_of_axis(ax)] for ax in range(len(shape_c))]
    out = coarse
    # expand each axis by broadcasting then reshaping (cheaper than repeat)
    for ax, r in enumerate(axes_ratio):
        if r == 1:
            continue
        out = jnp.expand_dims(out, ax + 1)
        tile_shape = list(out.shape)
        tile_shape[ax + 1] = r
        out = jnp.broadcast_to(out, tile_shape)
        merged = list(out.shape)
        merged[ax] = merged[ax] * r
        del merged[ax + 1]
        out = out.reshape(merged)
    return out


def semicoarsening_schedule(grid: Grid, max_depth: int = -1) -> List[Tuple[int, ...]]:
    """Per-MG-level coarsening ratios (reference:
    MappedAMRPoissonOpFactory.cpp:476-556).

    Returns a list of IntVect ratios; schedule[k] coarsens MG level k to
    level k+1.  Directions with dx <= max(dx)/2 coarsen first (anisotropy
    equalization); once dx is balanced, coarsening is isotropic.
    """
    sched = []
    g = grid
    while max_depth < 0 or len(sched) < max_depth:
        dx = np.asarray(g.dx)
        maxdx = dx.max()
        ratio = []
        for d in range(g.ndim):
            wants = dx[d] <= maxdx / 2.0 + 1e-14 * maxdx
            can = g.nx[d] % 2 == 0 and g.nx[d] >= 4
            ratio.append(2 if (wants and can) else 1)
        if not any(r > 1 for r in ratio):
            # anisotropy equalized (or blocked): coarsen everything possible
            ratio = [2 if (g.nx[d] % 2 == 0 and g.nx[d] >= 4) else 1
                     for d in range(g.ndim)]
        if not any(r > 1 for r in ratio):
            break
        sched.append(tuple(ratio))
        g = g.coarsen(ratio)
    return sched


# --------------------------------------------------------------------------
# solver parameters (reference: ProblemContext AMRMG.* namespace)
# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class MGParams:
    eps: float = 1e-6            # AMRMG.eps: relative residual tolerance
    imin: int = 2                # AMRMG.imin: min V-cycles
    imax: int = 20               # AMRMG.imax: max V-cycles
    hang: float = 1e-15          # AMRMG.hang: stall detection
    norm_thresh: float = 1e-30   # AMRMG.normThresh
    num_smooth_down: int = 4     # AMRMG.num_smooth_down
    num_smooth_up: int = 4       # AMRMG.num_smooth_up
    num_smooth_bottom: int = 16  # bottom-level smooth count
    num_mg: int = 1              # 1 = V-cycle, 2 = W-cycle
    max_depth: int = -1          # AMRMG.maxDepth
    #: -1 none / 0 jacobi / 1 gsrb / 3 line / "auto" (per-level choice:
    #: line where the metric's vertical coupling dominates, else gsrb —
    #: the decision the reference leaves to the input file's relax_mode)
    relax_mode: str = "auto"
    #: correction prolongation order: 1 = multilinear (default), 0 =
    #: piecewise-constant (reference ConstInterpPS parity)
    prolong_order: int = 1
    verbosity: int = 0
    #: MG bottom solver: "bicgstab" (reference parity — AMRPressureSolver
    #: registers a BiCGStabSolver as the AMRMG bottom,
    #: AMRPressureSolver.cpp:253-287) or "smooth" (num_smooth_bottom
    #: sweeps only; adequate on isotropic Cartesian coarse levels)
    bottom_solver: str = "bicgstab"
    # Preconditioning of the Krylov bottom solve: num_smooth_precond
    # relax sweeps in precond_mode (-1 none / 0 jacobi / 1 gsrb / 3
    # line), mirroring MappedAMRPoissonOp::preCond's smoother hooks.
    num_smooth_precond: int = 2
    precond_mode: int = 1
    # Krylov (BiCGStab) bottom/fallback solver knobs (reference: the
    # bottom.* input namespace, ProblemContext.cpp:1353+)
    bottom_eps: float = 1e-6     # bottom.eps
    bottom_imax: int = 80        # bottom.imax
    bottom_hang: float = 1e-8    # bottom.hang
    bottom_small: float = 1e-30  # bottom.small
    bottom_reps: float = 1e-12   # bottom.reps (secondary |rhs|-rel floor)
    bottom_num_restarts: int = 5     # bottom.numRestarts
    bottom_norm_type: int = 2        # bottom.normType (0 max / 2 L2)
    bottom_verbosity: int = 0        # bottom.verbosity

    def bottom_params(self):
        from somar_tpu.solvers.bicgstab import BiCGStabParams
        return BiCGStabParams(
            eps=self.bottom_eps, imax=self.bottom_imax,
            hang=self.bottom_hang, small=self.bottom_small,
            num_restarts=self.bottom_num_restarts,
            reps=self.bottom_reps, norm_type=self.bottom_norm_type)


class LevelMultigrid:
    """Single-level (no AMR) multigrid solver for one PoissonOp.

    Structural data (grid/geometry hierarchy, ops, masks) is built once;
    alpha/beta are call-time operands so a dt-dependent Helmholtz
    coefficient does not retrace or rebuild anything.
    """

    def __init__(self, geo: LevelGeometry, bcs: FieldBCs,
                 params: MGParams = MGParams(), dtype=jnp.float32):
        self.params = params
        self.dtype = dtype
        grid = geo.grid

        sched = semicoarsening_schedule(grid, params.max_depth)
        self.ratios = sched
        self.ops: List[PoissonOp] = []
        g, lg = grid, geo
        # ensure_compile_time_eval: keep the coarsened-geometry hierarchy
        # concrete when a concrete-geo MG is lazily built inside a jit
        # trace (else cached tracers break the next trace)
        import jax
        with jax.ensure_compile_time_eval():
            self.ops.append(PoissonOp(lg, bcs))
            from somar_tpu.geometry.raw_geometry import (
                RawGeoSource, coarsen_raw_geometry)
            raw = isinstance(geo.geo, RawGeoSource)
            for ratio in sched:
                g = g.coarsen(ratio)
                if raw:
                    # array-defined coefficients: coarsen them directly
                    lg = coarsen_raw_geometry(lg, ratio)
                else:
                    lg = build_level_geometry(g, geo.geo, dtype=dtype)
                self.ops.append(PoissonOp(lg, bcs))
        self.depth = len(self.ops)
        self.bcs_singular = self.ops[0].bcs_singular()
        self.modes = [self._level_mode(op) for op in self.ops]

    def _level_mode(self, op: PoissonOp) -> str:
        """Smoother for one MG level.  'auto' picks vertical line
        relaxation wherever the metric makes the vertical coupling
        dominate the strongest horizontal one (terrain-following /
        stretched maps; reference: LineGSRB is the prescribed smoother
        for exactly that anisotropy, GSRB.H:92), else point-GSRB (which
        rides the fused Pallas path on uniform metrics)."""
        mode = self.params.relax_mode
        if mode != "auto":
            return mode
        g = op.grid
        if g.ndim < 2 or op._vertical_line_parts() is None:
            return "gsrb"
        try:
            dv = g.vertical_dir
            # cellwise coupling strength per direction (face coefficients
            # averaged to cells); the anisotropy that stalls point
            # smoothers is LOCAL, so compare couplings cell by cell
            coup = []
            for d in range(g.ndim):
                jg = np.asarray(jax.device_get(op.geo.Jgup_diag[d])) \
                    * np.ones([g.fc_shape(d)[a] for a in range(g.ndim)])
                ax = g.axis(d)
                cc = 0.5 * (np.take(jg, range(jg.shape[ax] - 1), axis=ax)
                            + np.take(jg, range(1, jg.shape[ax]), axis=ax))
                coup.append(cc / (g.dx[d] ** 2))
            horiz = np.maximum.reduce(
                [np.broadcast_to(c, g.shape)
                 for d, c in enumerate(coup) if d != dv])
            anis = np.max(np.broadcast_to(coup[dv], g.shape)
                          / np.maximum(horiz, 1e-300))
            return "line" if anis > 4.0 else "gsrb"
        except Exception:
            # traced geometry (AMR make_level inside jit): no concrete
            # coefficients to inspect — fall back to computational dx
            dv = g.vertical_dir
            horiz = max(1.0 / g.dx[d] ** 2
                        for d in range(g.ndim) if d != dv)
            anis = (1.0 / g.dx[dv] ** 2) / horiz
            return "line" if anis > 4.0 else "gsrb"

    # ------------------------------------------------------------- V-cycle
    def _vcycle(self, lev: int, phi, rhs, alpha, beta, singular: bool,
                deltas=None, overrides=None):
        op = self.ops[lev]
        p = self.params
        mode = self.modes[lev]
        jd = deltas[lev] if deltas is not None else None
        ov = overrides[lev] if overrides is not None else None
        if lev == self.depth - 1:
            return self._bottom_solve(op, phi, rhs, alpha, beta, singular,
                                      jd, mode, ov)

        phi = op.relax(phi, rhs, alpha, beta, p.num_smooth_down, mode,
                       jgup_delta=jd, delta_overrides=ov)
        res = op.residual(phi, rhs, alpha, beta, jgup_delta=jd,
                          delta_overrides=ov)
        ratio = self.ratios[lev]
        crhs = self._restrict_residual(lev, res, ratio)
        cphi = jnp.zeros_like(crhs)
        for _ in range(max(1, p.num_mg)):   # num_mg=2 -> W-cycle
            cphi = self._vcycle(lev + 1, cphi, crhs, alpha, beta, singular,
                                deltas, overrides)
        if p.prolong_order >= 1:
            corr = prolong_linear_mg(cphi, op.grid, ratio, op.grid.periodic)
        else:
            corr = prolong_const(cphi, op.grid, ratio)
        if singular:
            corr = corr - jnp.mean(corr)    # ZeroAvgConstInterpPS
        phi = phi + corr.astype(phi.dtype)
        phi = op.relax(phi, rhs, alpha, beta, p.num_smooth_up, mode,
                       jgup_delta=jd, delta_overrides=ov)
        return phi

    def _restrict_residual(self, lev: int, res, ratio):
        """Residual restriction.  On mapped metrics the FV-consistent
        transfer is the J-weighted (volume-weighted) block average
        (reference: MappedCoarseAverage's MAPPEDAVERAGE kernel); on
        uniform maps J folds to a scalar and this is plain full
        weighting."""
        op_f, op_c = self.ops[lev], self.ops[lev + 1]
        Jf, Jc = op_f.geo.J, op_c.geo.J
        if jnp.ndim(Jf) == 0 and jnp.ndim(Jc) == 0:
            return restrict_fullweight(res, op_f.grid, ratio)
        num = restrict_fullweight(Jf * jnp.ones_like(res) * res,
                                  op_f.grid, ratio)
        return num / (Jc * jnp.ones_like(num))

    # -------------------------------------------------------- bottom solve
    def _bottom_solve(self, op: PoissonOp, phi, rhs, alpha, beta,
                      singular: bool, jd, mode: str, ov=None):
        """Coarsest-level solve.  Default: a few smooths then BiCGStab to
        bottom.eps, relax-preconditioned — the reference feeds a
        BiCGStabSolver to AMRMG as the bottom solver
        (AMRPressureSolver.cpp:253-287); smoothing-only bottoms stall MG
        on stretched/terrain-following coarse levels where the coarsest
        operator is still strongly anisotropic."""
        p = self.params
        if p.bottom_solver != "bicgstab":
            return op.relax(phi, rhs, alpha, beta, p.num_smooth_bottom,
                            mode, jgup_delta=jd, delta_overrides=ov)
        # cheap pre-smooth knocks out the high-frequency component
        phi = op.relax(phi, rhs, alpha, beta, max(2, p.num_smooth_down),
                       mode, jgup_delta=jd, delta_overrides=ov)

        def A(x):
            return op.apply(x, alpha, beta, jgup_delta=jd)

        M = None
        if p.num_smooth_precond > 0 and p.precond_mode >= 0:
            pm = {0: "jacobi", 1: "gsrb", 3: "line"}.get(
                p.precond_mode, mode)
            if p.precond_mode == 1 and mode == "line":
                pm = "line"   # anisotropic level: precondition in kind

            def M(v):
                return op.relax(jnp.zeros_like(v), v, alpha, beta,
                                p.num_smooth_precond, pm, jgup_delta=jd,
                                delta_overrides=ov)

        from somar_tpu.solvers.bicgstab import bicgstab
        r = op.residual(phi, rhs, alpha, beta, jgup_delta=jd,
                        delta_overrides=ov)
        if singular:
            r = op.compat_project(r)
        e, (its, relres) = bicgstab(A, r, M=M, params=p.bottom_params())
        if p.bottom_verbosity >= 2:
            from somar_tpu.utils.printing import debug_print
            debug_print("    MG bottom BiCGStab: {it} iters, relres {r:.2e}",
                        it=its, r=relres)
        if singular:
            e = e - jnp.mean(e)
        return phi + e

    # --------------------------------------------------------------- solve
    def solve(self, rhs, phi0=None, alpha=0.0, beta=1.0,
              homogeneous: bool = True, singular: Optional[bool] = None,
              jgup_deltas=None):
        """Iterate V-cycles until converged (imin/imax/eps/hang semantics,
        reference MappedAMRMultiGrid::solve).  Returns (phi, info) where
        info = (iters, final_relative_residual).

        singular: static flag; default True iff the BCs admit a constant
        null space AND alpha is the literal 0.0.  Pass explicitly when
        alpha is traced.
        With homogeneous=False, inhomogeneous BC values are folded into the
        RHS by linearity (L_inhom(phi) = L_hom(phi) + L_inhom(0)).
        """
        op = self.ops[0]
        p = self.params
        rhs = rhs.astype(self.dtype)
        if singular is None:
            singular = self.bcs_singular and isinstance(alpha, float) and alpha == 0.0
        jd0 = jgup_deltas[0] if jgup_deltas is not None else None
        # per-level runtime kernel weights with the delta folded in
        # (probed ONCE here, loop-invariant across V-cycles); levels whose
        # plan cannot represent the delta get None -> jnp fallback there
        overrides = None
        if jgup_deltas is not None:
            overrides = [o.delta_kernel_overrides(jd)
                         for o, jd in zip(self.ops, jgup_deltas)]
        ov0 = overrides[0] if overrides is not None else None
        if not homogeneous:
            rhs = rhs - op.apply(jnp.zeros_like(rhs), alpha, beta,
                                 homogeneous=False, jgup_delta=jd0)
        if singular:
            # J-weighted compatibility projection (plain mean removal
            # leaves an unreachable rhs component on mapped metrics)
            rhs = op.compat_project(rhs)
        phi = jnp.zeros_like(rhs) if phi0 is None else phi0.astype(self.dtype)

        # Convergence reference: ||rhs||, NOT the initial-guess residual.
        # A warm start (the projectors chain the previous step's
        # potential) makes the guess residual tiny; eps relative to IT
        # demands 1e-5 of an already-converged answer, so warm solves
        # grind to imax while cold solves pass — measured 11 stuck
        # V-cycles on a warm 512 solve.  For phi0 = 0 the two references
        # coincide exactly (residual(0) = rhs).  r0 (the guess residual)
        # still seeds the hang/best-iterate tracking.
        r_ref = jnp.maximum(op.norm(rhs), p.norm_thresh)
        r0 = op.norm(op.residual(phi, rhs, alpha, beta, jgup_delta=jd0,
                                 delta_overrides=ov0))
        r0 = jnp.maximum(r0, p.norm_thresh)

        # Best-iterate tracking: a Krylov bottom makes the per-cycle
        # residual non-monotone, and the old single-cycle hang test
        # aborted healthy solves on the first uptick (the round-3
        # regression on stretched metrics).  Stall now means two
        # consecutive cycles without improving on the BEST residual, and
        # the returned iterate is the best one seen.
        def cond(state):
            phi, rnorm, best, _, stall, it = state
            unconverged = best > p.eps * r_ref
            not_hung = stall < 2
            # a warm start already below target skips even the imin
            # cycles (imin guards against a deceptive first-cycle
            # residual, which cannot happen when nothing ran yet)
            return (((it < p.imin) | (unconverged & not_hung))
                    & (it < p.imax) & (best > p.eps * r_ref))

        def body(state):
            phi, rnorm, best, phi_best, stall, it = state
            phi = self._vcycle(0, phi, rhs, alpha, beta, singular,
                               jgup_deltas, overrides)
            if singular:
                phi = phi - jnp.mean(phi)
            rnew = op.norm(op.residual(phi, rhs, alpha, beta, jgup_delta=jd0,
                                       delta_overrides=ov0))
            if p.verbosity >= 2:
                # per-V-cycle residual trace (reference: AMRMG.verbosity
                # prints |r| each cycle, MappedAMRMultiGrid::solve);
                # no-ops on backends without host-callback support
                from somar_tpu.utils.printing import debug_print
                debug_print(
                    "    MG V-cycle {it}: |r|/|r0| = {r:.3e}",
                    it=it + 1, r=rnew / r0)
            improved = rnew < (1.0 - p.hang) * best
            phi_best = jnp.where(improved, phi, phi_best)
            stall = jnp.where(improved, 0, stall + 1)
            best = jnp.minimum(best, rnew)
            return (phi, rnew, best, phi_best, stall, it + 1)

        state = (phi, r0, r0, phi, jnp.asarray(0), jnp.asarray(0))
        _, _, best, phi_best, _, iters = jax.lax.while_loop(cond, body, state)
        return phi_best, (iters, best / r_ref)
