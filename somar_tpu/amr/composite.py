"""Composite multi-level elliptic solver over the AMR patch hierarchy.

Re-design of the reference's composite AMR elliptic machinery — the
AMR-FAS cycle `MappedAMRMultiGrid` (`/root/reference/src/calculus/
AMRElliptic/MappedAMRMultiGrid.H:42,238` — AMRVCycle with per-level
AMRResidual/AMRRestrict/AMRProlong) and its leptic twin `AMRLepticSolver`
(`/root/reference/src/calculus/LepticSolver/AMRLepticSolver.H:42`,
solve driver AMRLepticSolver.cpp:188-324) — for the dense-patch data
model:

  One composite iteration is a multiplicative two-level pass per
  refinement boundary (coarse-to-fine Schwarz with coarse correction):

    top-down   — solve each level with the QUADRATIC CF ghost-potential
                 ring interpolated from its parent patch's current
                 solution folded into the RHS (the dense analog of
                 AMRProlong + boundary interpolation);
    bottom-up  — J-weighted average-down of the fine solution onto the
                 parent's covered cells (the dense analog of
                 AMRRestrict), so the next coarse solve sees the fine
                 correction.

  Convergence is measured by the COMPOSITE residual: per level,
  r = rhs - L(phi; ring ghosts), with parent cells covered by a finer
  patch masked out (reference: AMRResidual's covered-region zeroing) —
  iterate until its norm drops by `eps` relative to the initial one.

  Which single-level solver runs per level follows the level projector's
  solver mux (MG / leptic / BiCGStab / spectral) — with
  projection.solver = leptic this IS the composite leptic solver, with
  MG it is the composite multigrid (the reference's AMRPressureSolver
  builds exactly this pairing, AMRPressureSolver.cpp:39-40).

The hierarchy's sync projection and volume-discrepancy (eLambda) solves
are the production consumers (AMRNavierStokesSync.cpp:276-295, :850).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CompositeParams:
    iters: int = 4          # max composite passes (AMRMG.max_iter analog)
    eps: float = 1e-6       # composite relative residual target
    purpose: str = "sync"   # per-level solver-params namespace
    #: FAS tau-correction of covered coarse cells.  True for direct
    #: elliptic solves (converges past the O(h^2) Schwarz fixed point).
    use_tau: bool = True
    #: Elliptic reflux: replace the coarse flux on coarse-fine interface
    #: faces with the averaged fine flux in the coarse equation at the
    #: UNCOVERED cells adjacent to the interface (reference:
    #: MappedAMRPoissonOp::AMRResidual's reflux step,
    #: MappedAMRPoissonOp.cpp AMROperator/reflux).  Without it the tau
    #: correction alone leaves the composite operator flux-inconsistent
    #: exactly at the interface: the covered-cell equation is the fine
    #: operator's, but the neighboring uncovered cell still differences
    #: the COARSE flux across the shared face — the mismatch acts as a
    #: spurious interface source, which the sync-projection feedback loop
    #: amplifies step over step (round-2 measured blow-up of the 2-level
    #: lock exchange by step ~60 with tau on / reflux absent).
    use_reflux: bool = True


class AMRCompositeSolver:
    """Composite solve of L phi = rhs over [level0, patch levels].

    Built on an AMRHierarchy: consumes its couplings' CF-ring
    interpolation, average-down, and per-level projector solvers."""

    def __init__(self, hierarchy, params: CompositeParams = CompositeParams()):
        self.h = hierarchy
        self.params = params

    # ------------------------------------------------------------ pieces
    def _levels(self, geos):
        """Per-coupling LISTS of per-patch level objects (a mapped
        multi-patch coupling's K levels each carry their own traced
        metric slice, AMRHierarchy._levels_for)."""
        return [self.h._levels_for(lev, geos)
                for lev in range(len(self.h.couplings))]

    def _covered_mask(self, lev, origins, weights):
        """1 where level `lev`'s cells are covered by a finer patch
        (lev = -1 is the base level).  Traced (origins move)."""
        h = self.h
        c = h.couplings[lev + 1]
        pgrid = c.parent_grid
        ndim = pgrid.ndim
        mask = jnp.zeros(pgrid.shape, bool)
        org = origins[lev + 1]
        K = c.K
        w = weights[lev + 1] if (weights is not None and K > 1) else None
        H = c.halo
        int_start = tuple(H if pgrid.dir_of_axis(ax) in c.cf_dirs else 0
                          for ax in range(ndim))
        int_shape = tuple(c.interior_nx[pgrid.dir_of_axis(ax)]
                          for ax in range(ndim))
        block = jnp.ones(tuple(s // c._axis_ratio(ax)
                               for ax, s in enumerate(int_shape)), bool)
        for k in range(K):
            o = org[k] if K > 1 else org
            origin_c = tuple((o[ax] + int_start[ax]) // c._axis_ratio(ax)
                             for ax in range(ndim))
            blk = block
            if w is not None:
                blk = blk & (w[k] > 0.0)
            mask = jax.lax.dynamic_update_slice(
                mask, mask_or := jnp.logical_or(
                    jax.lax.dynamic_slice(mask, origin_c, blk.shape), blk),
                origin_c)
        return mask

    def _reflux_fold(self, c, level, par_level, phi_f, ring, ph_par,
                     origin_f, target, sign, weight=None):
        """Fold the CF-interface flux deficit

            delta F = <F_fine(phi_f; ring ghosts)> - F_coarse(phi_par)

        into `target` (a parent-shaped CC array) at the uncovered cells
        adjacent to the interface: target += sign * Jinv * (+/-)deltaF/dx
        with `sign=-1` building the composite OPERATOR L_comp = L_par +
        refluxcorr and `sign=+1` the residual/RHS fold rhs - refluxcorr.
        The dense analog of MappedAMRPoissonOp's elliptic reflux
        (LevelFluxRegister fed with Jgup grad phi on both sides,
        MappedAMRPoissonOp.cpp reflux); reuses the advective
        PatchFluxRegister since the deficit algebra is identical."""
        from somar_tpu.amr.flux_register import PatchFluxRegister
        fr = PatchFluxRegister(c)
        reg = fr.zeros()
        grad_f = level.projector._grad_with_ring(phi_f, ring)
        reg = fr.increment_fine(reg, grad_f, 1.0)
        grad_c = par_level.projector._grad_with_ring(ph_par, None)
        reg = fr.increment_coarse(reg, grad_c, origin_f)
        dt = sign if weight is None else sign * weight
        return fr.reflux(target, reg, origin_f, dt,
                         par_level.projector.op.geo)

    def composite_residual(self, phis, rhss, origins, geos=None,
                           weights=None, parent_sels=None):
        """Max-norm of the composite residual (covered parent cells
        masked; CF ghosts from the parent's current solution; parent
        cells adjacent to the interface reflux-corrected so the norm
        measures the COMPOSITE operator — reference: AMRResidual's
        reflux step)."""
        h = self.h
        p = self.params
        levels = self._levels(geos)
        # pass 1: per-level residual arrays (stacked over K when K > 1),
        # parents reflux-corrected at CF-adjacent cells
        res = [h.level0.projector.op.residual(phis[0], rhss[0])]
        parent_K = 1
        for lev, c in enumerate(h.couplings):
            K = c.K
            org = origins[lev]
            psel = (parent_sels[lev]
                    if (parent_sels is not None and parent_K > 1
                        and parent_sels[lev] is not None) else None)
            rrs = []
            par_res = res[lev]
            for k in range(K):
                level = levels[lev][k]
                phi_f = phis[lev + 1][k] if K > 1 else phis[lev + 1]
                rhs_f = rhss[lev + 1][k] if K > 1 else rhss[lev + 1]
                ok = org[k] if K > 1 else org
                if parent_K == 1:
                    ph_par = phis[lev]
                    pk = None
                    par_level = (h.level0 if lev == 0
                                 else levels[lev - 1][0])
                else:
                    pk = (psel[k] if psel is not None
                          else jnp.zeros((), jnp.int32))
                    ph_par = jax.lax.dynamic_index_in_dim(
                        phis[lev], pk, 0, keepdims=False)
                    par_level = h._parent_level_for(lev, geos, pk)
                ring = c._ring(ph_par, ok)
                rr = level.projector.op.residual(
                    phi_f, rhs_f - level.projector._rhs_ring_correction(
                        ring))
                rrs.append(rr)
                if p.use_reflux:
                    wk = (weights[lev][k]
                          if (weights is not None and K > 1) else None)
                    if parent_K == 1:
                        par_res = self._reflux_fold(
                            c, level, par_level, phi_f, ring, ph_par, ok,
                            par_res, +1.0, wk)
                    else:
                        cur = jax.lax.dynamic_index_in_dim(
                            par_res, pk, 0, keepdims=False)
                        cur = self._reflux_fold(
                            c, level, par_level, phi_f, ring, ph_par, ok,
                            cur, +1.0, wk)
                        par_res = jax.lax.dynamic_update_index_in_dim(
                            par_res, cur, pk, 0)
            res[lev] = par_res
            res.append(jnp.stack(rrs) if K > 1 else rrs[0])
            parent_K = K
        # pass 2: covered-cell masking, per-patch weighting, max norm
        worst = None
        for lv, r in enumerate(res):
            if lv < len(h.couplings):
                mask = self._covered_mask(lv - 1, origins, weights)
                r = jnp.where(mask, 0.0, r)
            if lv == 0:
                worst = jnp.max(jnp.abs(r))
                continue
            K = h.couplings[lv - 1].K
            if K > 1:
                m = jnp.max(jnp.abs(r), axis=tuple(range(1, r.ndim)))
                w = (weights[lv - 1] if weights is not None
                     else jnp.ones_like(m))
                worst = jnp.maximum(worst, jnp.max(m * w))
            else:
                worst = jnp.maximum(worst, jnp.max(jnp.abs(r)))
        return worst

    # ------------------------------------------------------------- solve
    def _effective_rhss(self, phis, rhss, origins, levels, weights,
                        parent_sels, geos=None):
        """FAS tau-correction (the heart of MappedAMRMultiGrid's
        AMRResidual/AMRRestrict cycle): the parent's COVERED-cell
        equation becomes the restricted fine equation,

            rhs_par(covered) := L_par(phi_par) + R(rhs_f - L_f(phi_f)),

        so the coarse solve sees the fine operator's truth instead of
        its own discretization there.  Without it the composite
        iteration stalls at the O(h^2) coarse-fine mismatch (~1e-3
        relative) no matter how many passes run.  Applied fine-to-coarse
        so deeper corrections propagate.  Multi-patch parents are
        supported: each fine patch's tau lands in its selected parent
        patch (parent_sels), whose own operator application carries that
        parent's CF ring from ITS (possibly selected) parent."""
        from somar_tpu.amr.transfer import (extract_patch, insert_patch,
                                            restrict_average)
        h = self.h
        eff = list(rhss)
        for lev in range(len(h.couplings) - 1, -1, -1):
            c = h.couplings[lev]
            parent_K = 1 if lev == 0 else h.couplings[lev - 1].K
            # per-parent-patch operator application L_par(phi_par) + the
            # parent's own CF-ring contribution (stacked when parent_K>1)
            gsel = (parent_sels[lev - 1]
                    if (lev > 0 and parent_sels is not None
                        and parent_sels[lev - 1] is not None) else None)
            apply_pars = []
            for kp in range(parent_K):
                par_level = (h.level0 if lev == 0
                             else levels[lev - 1][kp])
                ph_par_kp = phis[lev][kp] if parent_K > 1 else phis[lev]
                ap = par_level.projector.op.apply(ph_par_kp)
                if lev > 0:
                    cp = h.couplings[lev - 1]
                    gp_K = 1 if lev == 1 else h.couplings[lev - 2].K
                    if gp_K == 1:
                        ph_gp = phis[lev - 1]
                    else:
                        g = (gsel[kp] if gsel is not None
                             else jnp.zeros((), jnp.int32))
                        ph_gp = jax.lax.dynamic_index_in_dim(
                            phis[lev - 1], g, 0, keepdims=False)
                    oo = (origins[lev - 1][kp] if cp.K > 1
                          else origins[lev - 1])
                    pring = cp._ring(ph_gp, oo)
                    ap = ap + par_level.projector._rhs_ring_correction(
                        pring)
                apply_pars.append(ap)
            apply_par_stack = (jnp.stack(apply_pars) if parent_K > 1
                               else apply_pars[0])
            K = c.K
            org = origins[lev]
            psel = (parent_sels[lev]
                    if (parent_sels is not None and parent_K > 1
                        and parent_sels[lev] is not None) else None)
            pgrid = c.parent_grid
            ndim = pgrid.ndim
            H = c.halo
            int_start = tuple(
                H if pgrid.dir_of_axis(ax) in c.cf_dirs else 0
                for ax in range(ndim))
            int_shape = tuple(c.interior_nx[pgrid.dir_of_axis(ax)]
                              for ax in range(ndim))
            new_par = eff[lev]
            for k in range(K):
                level = levels[lev][k]
                phi_f = phis[lev + 1][k] if K > 1 else phis[lev + 1]
                rhs_f = eff[lev + 1][k] if K > 1 else eff[lev + 1]
                ok = org[k] if K > 1 else org
                if parent_K == 1:
                    ph_par = phis[lev]
                    apply_par = apply_par_stack
                    par_entry = new_par
                    par_level = (h.level0 if lev == 0
                                 else levels[lev - 1][0])
                else:
                    pk = (psel[k] if psel is not None
                          else jnp.zeros((), jnp.int32))
                    ph_par = jax.lax.dynamic_index_in_dim(
                        phis[lev], pk, 0, keepdims=False)
                    apply_par = jax.lax.dynamic_index_in_dim(
                        apply_par_stack, pk, 0, keepdims=False)
                    par_entry = jax.lax.dynamic_index_in_dim(
                        new_par, pk, 0, keepdims=False)
                    par_level = h._parent_level_for(lev, geos, pk)
                ring = c._ring(ph_par, ok)
                wk = (weights[lev][k]
                      if (weights is not None and K > 1) else None)
                if self.params.use_tau:
                    rf = rhs_f - (level.projector.op.apply(phi_f)
                                  + level.projector._rhs_ring_correction(
                                      ring))
                    block = extract_patch(rf, int_start, int_shape)
                    Rrf = restrict_average(block, c.ext_grid, c.ratio)
                    origin_c = tuple((ok[ax] + int_start[ax])
                                     // c._axis_ratio(ax)
                                     for ax in range(ndim))
                    tau = extract_patch(apply_par, origin_c, Rrf.shape) \
                        + Rrf
                    if wk is not None:
                        cur = extract_patch(par_entry, origin_c, Rrf.shape)
                        tau = cur + wk * (tau - cur)
                    par_entry = insert_patch(par_entry,
                                             tau.astype(par_entry.dtype),
                                             origin_c)
                if self.params.use_reflux:
                    # defect-correct the UNCOVERED interface-adjacent
                    # cells: the coarse solve's rhs carries the (lagged)
                    # fine-vs-coarse flux deficit so its solution matches
                    # the composite operator (AMRResidual's reflux)
                    par_entry = self._reflux_fold(
                        c, level, par_level, phi_f, ring, ph_par, ok,
                        par_entry, +1.0, wk)
                if parent_K == 1:
                    new_par = par_entry
                else:
                    new_par = jax.lax.dynamic_update_index_in_dim(
                        new_par, par_entry, pk, 0)
            eff[lev] = new_par
        return eff

    def solve(self, rhss, origins, geos=None, weights=None,
              parent_sels=None, phis0=None):
        """Composite solve.  rhss: [rhs_level0, rhs_patch1, ...] (patch
        entries carry the K axis when multi-patch).  Returns
        (phis, (iters, rel_residual))."""
        h = self.h
        p = self.params
        levels = self._levels(geos)
        phis = (list(phis0) if phis0 is not None else
                [jnp.zeros_like(r) for r in rhss])

        def one_pass(phis):
            phis = list(phis)
            # FAS tau-correction + elliptic-reflux defect correction from
            # the CURRENT iterate (see _effective_rhss), then top-down
            # level solves with parent-ring CF ghosts
            if p.use_tau or p.use_reflux:
                eff = self._effective_rhss(phis, rhss, origins, levels,
                                           weights, parent_sels,
                                           geos=geos)
            else:
                eff = list(rhss)
            phi0, _ = h.level0.projector._solve(eff[0], phi0=phis[0],
                                                purpose=p.purpose)
            phis[0] = phi0
            parent_phis = phi0
            parent_K = 1
            for lev, c in enumerate(h.couplings):
                K = c.K
                org = origins[lev]
                psel = (parent_sels[lev]
                        if (parent_sels is not None and parent_K > 1
                            and parent_sels[lev] is not None) else None)
                outs = []
                for k in range(K):
                    level = levels[lev][k]
                    phi_f = phis[lev + 1][k] if K > 1 else phis[lev + 1]
                    rhs_f = eff[lev + 1][k] if K > 1 else eff[lev + 1]
                    if parent_K == 1:
                        ph_par = parent_phis
                    else:
                        pk = (psel[k] if psel is not None
                              else jnp.zeros((), jnp.int32))
                        ph_par = jax.lax.dynamic_index_in_dim(
                            parent_phis, pk, 0, keepdims=False)
                    ring = c._ring(ph_par, org[k] if K > 1 else org)
                    rhs_eff = rhs_f - \
                        level.projector._rhs_ring_correction(ring)
                    out, _ = level.projector._solve(rhs_eff, phi0=phi_f,
                                                    purpose=p.purpose)
                    outs.append(out)
                phis[lev + 1] = jnp.stack(outs) if K > 1 else outs[0]
                parent_phis = phis[lev + 1]
                parent_K = K
            # bottom-up: average the fine solution onto covered parents
            for lev in range(len(h.couplings) - 1, -1, -1):
                c = h.couplings[lev]
                K = c.K
                org = origins[lev]
                parent_K = 1 if lev == 0 else h.couplings[lev - 1].K
                psel = (parent_sels[lev]
                        if (parent_sels is not None and parent_K > 1
                            and parent_sels[lev] is not None) else None)
                for k in range(K):
                    phi_f = phis[lev + 1][k] if K > 1 else phis[lev + 1]
                    wk = (weights[lev][k]
                          if (weights is not None and K > 1) else None)
                    ok = org[k] if K > 1 else org
                    par = phis[lev]
                    if parent_K > 1:
                        pk = (psel[k] if psel is not None
                              else jnp.zeros((), jnp.int32))
                        sel = jax.lax.dynamic_index_in_dim(
                            par, pk, 0, keepdims=False)
                        sel = self._avg_down_phi(c, sel, phi_f, ok, wk)
                        par = jax.lax.dynamic_update_index_in_dim(
                            par, sel, pk, 0)
                    else:
                        par = self._avg_down_phi(c, par, phi_f, ok, wk)
                    phis[lev] = par
            return phis

        res0 = self.composite_residual(phis, rhss, origins, geos, weights,
                                       parent_sels)
        res0 = jnp.maximum(res0, 1e-30)
        it_done = 0
        res = res0
        for it in range(p.iters):
            # statically unrolled (level solves carry their own while
            # loops; the composite pass count is a config knob)
            phis = one_pass(phis)
            res = self.composite_residual(phis, rhss, origins, geos,
                                          weights, parent_sels)
            it_done = it + 1
        return phis, (it_done, res / res0)

    @staticmethod
    def _avg_down_phi(c, par, phi_f, origin_f, weight):
        """Average one patch potential down onto its parent array
        (scalar analog of PatchCoupling.average_down)."""
        from somar_tpu.amr.transfer import extract_patch, insert_patch, \
            restrict_average
        pgrid = c.parent_grid
        ndim = pgrid.ndim
        H = c.halo
        int_start = tuple(H if pgrid.dir_of_axis(ax) in c.cf_dirs else 0
                          for ax in range(ndim))
        int_shape = tuple(c.interior_nx[pgrid.dir_of_axis(ax)]
                          for ax in range(ndim))
        origin_c = tuple((origin_f[ax] + int_start[ax]) //
                         c._axis_ratio(ax) for ax in range(ndim))
        block = extract_patch(phi_f, int_start, int_shape)
        avg = restrict_average(block, c.ext_grid, c.ratio)
        if weight is not None:
            cur = extract_patch(par, origin_c, avg.shape)
            avg = cur + weight * (avg.astype(par.dtype) - cur)
        return insert_patch(par, avg.astype(par.dtype), origin_c)
