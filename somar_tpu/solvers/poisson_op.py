"""The mapped-grid Helmholtz operator  L[phi] = alpha*phi + beta*(1/J) d_d (J g^{dj} d_j phi).

Re-design of the reference's MappedAMRPoissonOp
(`/root/reference/src/calculus/AMRElliptic/MappedAMRPoissonOp.H:49`, kernels
MAPPEDGETFLUX[ORTHO], FILLMAPPEDLAPDIAG*, GSRBITER*, JACOBIITER,
LineGSRBIter* in MappedAMRPoissonOpF.ChF / GSRBF.ChF): one operator object
per (geometry, BCs); apply/residual are fused XLA stencils; relaxation is
vectorized red-black Gauss-Seidel over checkerboard masks, damped Jacobi,
or vertical line relaxation via batched tridiagonal solves (the anisotropy
killer, reference LineGSRB).

TPU-design note: alpha and beta are **call-time operands**, not
construction-time constants — the viscous/diffusive Helmholtz coefficient
contains dt, which is a traced value inside the jitted time step.  All
structural data (Laplacian diagonal, BC factors, red-black masks) is
precomputed once; `alpha + beta * diag_lap` folds into the smoother.
The reference instead rebuilds operators per dt
(MappedBaseLevelHeatSolver); the TPU path cannot afford a recompile.

The operator diagonal carries exact BC modifications (Dirichlet ghost
mirrors double the boundary-face coupling; Neumann zeroes it; periodic
keeps it), mirroring FILLMAPPEDLAPDIAG + DIAGPRECOND.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from somar_tpu.core.bc import BCType, FieldBCs
from somar_tpu.geometry.level_geometry import LevelGeometry
from somar_tpu.ops.stencil import mac_divergence, mac_gradient, slc


def _use_fused_gsrb() -> bool:
    """Fused Pallas smoother/residual: on TPU when the trace is
    shard-local (parallel/pallas_gate.py — Pallas custom calls are
    unpartitionable under GSPMD).  Env-overridable (SOMAR_FUSED_GSRB=0/1).
    """
    import os
    flag = os.environ.get("SOMAR_FUSED_GSRB", "")
    if flag in ("0", "off"):
        return False
    if flag in ("1", "on"):
        return True
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    from somar_tpu.parallel.pallas_gate import default_allowed
    return default_allowed()


class PoissonOp:
    """alpha*I + beta*div(Jgup grad) on one level, with BCs baked in."""

    def __init__(self, geo: LevelGeometry, bcs: FieldBCs):
        self.geo = geo
        self.bcs = bcs
        self.hom_bcs = bcs.homogeneous()
        self.grid = geo.grid
        # ensure_compile_time_eval: ops with concrete geometry must stay
        # concrete even when the op is (lazily) constructed inside a jit
        # trace — otherwise the cached structural arrays leak tracers into
        # the next trace (UnexpectedTracerError on retrace).  Traced-geo
        # ops (mapped AMR make_level) are rebuilt per trace and unaffected.
        with jax.ensure_compile_time_eval():
            self._bc_face_factors = self._build_bc_face_factors()
            self._diag_lap = self._build_diag_lap()
            self._rb_masks = self._build_rb_masks()
            self._line_coefs = self._build_vertical_line_parts()
        # fused Pallas GSRB/residual (uniform metric + simple BCs only;
        # ops/gsrb_pallas.py): one HBM round trip per red+black sweep vs
        # the jnp path's residual-per-half-sweep with pad relayouts
        self._fused_plan = None
        self._stencil_plan = None
        if _use_fused_gsrb():
            from somar_tpu.ops.gsrb_pallas import make_plan
            self._fused_plan = make_plan(self.grid, self.hom_bcs, geo)
            if self._fused_plan is None:
                # mapped metrics (array-coefficient / non-diagonal Jgup):
                # probe-extracted stencil kernels, exact vs the jnp path
                # (ops/stencil_gsrb_pallas.py); requires concrete geometry
                from somar_tpu.ops.stencil_gsrb_pallas import \
                    build_stencil_plan
                with jax.ensure_compile_time_eval():
                    self._stencil_plan = build_stencil_plan(self)

    # ------------------------------------------------------------ operator
    def apply(self, phi, alpha=0.0, beta=1.0, homogeneous: bool = True,
              jgup_delta=None):
        bcs = self.hom_bcs if homogeneous else self.bcs
        lap = mac_divergence(
            mac_gradient(phi, self.geo, bcs, jgup_delta=jgup_delta),
            self.geo)
        return alpha * phi + beta * lap

    def residual(self, phi, rhs, alpha=0.0, beta=1.0, homogeneous: bool = True,
                 jgup_delta=None, delta_overrides=None):
        if homogeneous and jgup_delta is None:
            if self._fused_plan is not None:
                from somar_tpu.ops.gsrb_pallas import helm_residual
                return helm_residual(self._fused_plan, phi, rhs, alpha, beta)
            if self._stencil_plan is not None:
                from somar_tpu.ops.stencil_gsrb_pallas import helm_residual
                return helm_residual(self._stencil_plan, phi, rhs, alpha,
                                     beta)
        if homogeneous and delta_overrides is not None \
                and self._stencil_plan is not None:
            # runtime (traced) delta weights: the IG altered metric enters
            # the operator linearly, so the kernel takes plan.Wn + dWn as
            # operands (delta_kernel_overrides below) instead of falling
            # back to the jnp path
            from somar_tpu.ops.stencil_gsrb_pallas import helm_residual
            Wn, R, _ = delta_overrides
            return helm_residual(self._stencil_plan, phi, rhs, alpha, beta,
                                 Wn=Wn, R=R)
        return rhs - self.apply(phi, alpha, beta, homogeneous, jgup_delta)

    def delta_kernel_overrides(self, jgup_delta):
        """(Wn, R, w0) runtime-weight operands for the probed-stencil
        kernels with a traced jgup_delta folded in, or None when the
        kernel path is unavailable (no plan, or the delta's support may
        exceed the plan's probed offsets).  Costs 2*ncolors traced
        operator applications — hoist once per solve (LevelMultigrid
        does), never per relax call."""
        if jgup_delta is None or self._stencil_plan is None:
            return None
        from somar_tpu.ops.stencil_gsrb_pallas import delta_stencil_weights
        got = delta_stencil_weights(self._stencil_plan, self, jgup_delta)
        if got is None:
            return None
        dWn, dR = got
        plan = self._stencil_plan
        return (plan.Wn + dWn, plan.R + dR, self.diag(0.0, 1.0, jgup_delta))

    def compat_project(self, rhs):
        """Remove the rhs component outside the singular (pure-Neumann)
        operator's range.  The solvability condition on a mapped metric is
        the J-WEIGHTED mean: integral(J*rhs) = 0 — a plain mean removal
        leaves an irreducible residual floor proportional to the J
        variation (reference: setToZeroAvg-style compatibility handling
        of the Neumann projections)."""
        J = self.geo.J * jnp.ones_like(rhs)
        return rhs - jnp.sum(J * rhs) / jnp.sum(J)

    def diag(self, alpha=0.0, beta=1.0, jgup_delta=None):
        d = self._diag_lap
        if jgup_delta is not None and jgup_delta[0] is not None:
            d = d + self._diag_lap_of(jgup_delta[0])
        return alpha + beta * d

    # ------------------------------------------------------------ diagonal
    def _bc_factor(self, bc):
        """Boundary-face coupling multiplier from the ghost formula."""
        if bc.type == BCType.DIRICHLET:
            return 2.0
        if bc.type == BCType.NEUMANN:
            return 0.0
        if bc.type == BCType.PERIODIC:
            return 1.0
        if bc.type == BCType.CF:
            return 1.0  # ghost holds external data, coupling intact
        return 0.0  # extrap ~ one-sided; treat as Neumann for the diag

    def _build_bc_face_factors(self):
        """Per-direction (lo_factor, hi_factor) CC fields encoding the BC
        ghost-formula effect on the boundary-face coupling."""
        grid = self.grid
        shape = grid.shape
        out = []
        for d in range(grid.ndim):
            ax = grid.axis(d)
            n = shape[ax]
            lo_f = jnp.ones(shape).at[self._edge(ax, 0)].set(
                self._bc_factor(self.bcs.lo[d]))
            hi_f = jnp.ones(shape).at[self._edge(ax, n - 1)].set(
                self._bc_factor(self.bcs.hi[d]))
            out.append((lo_f, hi_f))
        return out

    def _diag_lap_of(self, jgup_diag_per_d):
        """Laplacian diagonal for a given set of per-direction face
        coefficients (reference: FILLMAPPEDLAPDIAG kernels)."""
        grid, geo = self.grid, self.geo
        shape = grid.shape
        diag = jnp.zeros(shape)
        for d in range(grid.ndim):
            if jgup_diag_per_d[d] is None:
                continue
            ax = grid.axis(d)
            Jg = jgup_diag_per_d[d] * jnp.ones(grid.fc_shape(d))
            lo = slc(Jg, ax, 0, -1)
            hi = slc(Jg, ax, 1, None)
            lo_f, hi_f = self._bc_face_factors[d]
            diag = diag - (lo * lo_f + hi * hi_f) / (grid.dx[d] ** 2)
        return geo.Jinv * diag

    def _build_diag_lap(self):
        return self._diag_lap_of(self.geo.Jgup_diag)

    def _edge(self, ax: int, idx: int):
        sl = [slice(None)] * self.grid.ndim
        sl[ax] = idx
        return tuple(sl)

    # ---------------------------------------------------------- relaxation
    def _build_rb_masks(self):
        shape = self.grid.shape
        parity = jnp.zeros(shape, jnp.int32)
        for ax in range(len(shape)):
            parity = parity + jax.lax.broadcasted_iota(jnp.int32, shape, ax)
        red = (parity % 2) == 0
        return red, jnp.logical_not(red)

    def relax_jacobi(self, phi, rhs, alpha, beta, iters: int,
                     weight: float = 0.6, jgup_delta=None):
        inv_diag = weight / self.diag(alpha, beta, jgup_delta)

        def body(_, p):
            return p + inv_diag * self.residual(p, rhs, alpha, beta,
                                                jgup_delta=jgup_delta)

        return jax.lax.fori_loop(0, iters, body, phi)

    def relax_gsrb(self, phi, rhs, alpha, beta, iters: int,
                   weight: float = 1.0, jgup_delta=None,
                   delta_overrides=None):
        """Red-black Gauss-Seidel (reference: LevelGSRB, GSRBITER*).

        The reference splits each sweep into an interior pass
        (fullStencilGSRB — "does not take special care at box
        boundaries") plus boundaryGSRB fix-up passes with one-sided
        stencils, and offers LooseGSRB (one asynchronous exchange
        instead of two) as a comms shortcut (GSRB.H:33-90).  Both are
        SUBSUMED here: the dense sweep's stencil carries exact
        BC-folded coefficients at every cell (no boundary fix-up
        needed — asserted against the ghost-fill operator to roundoff
        in tests), and the single-array model has no exchanges to
        loosen."""
        if jgup_delta is None:
            if self._fused_plan is not None:
                from somar_tpu.ops.gsrb_pallas import gsrb_sweeps
                return gsrb_sweeps(self._fused_plan, phi, rhs, alpha, beta,
                                   iters, weight)
            if self._stencil_plan is not None:
                from somar_tpu.ops.stencil_gsrb_pallas import gsrb_sweeps
                return gsrb_sweeps(self._stencil_plan, phi, rhs, alpha,
                                   beta, iters, weight)
        if delta_overrides is not None and self._stencil_plan is not None:
            from somar_tpu.ops.stencil_gsrb_pallas import gsrb_sweeps
            Wn, R, w0 = delta_overrides
            return gsrb_sweeps(self._stencil_plan, phi, rhs, alpha, beta,
                               iters, weight, Wn=Wn, R=R, w0=w0)
        red, black = self._rb_masks
        inv_diag = weight / self.diag(alpha, beta, jgup_delta)

        def half(p, mask):
            r = self.residual(p, rhs, alpha, beta, jgup_delta=jgup_delta)
            return jnp.where(mask, p + inv_diag * r, p)

        def body(_, p):
            return half(half(p, red), black)

        return jax.lax.fori_loop(0, iters, body, phi)

    def _build_vertical_line_parts(self):
        """Static vertical tridiagonal structure: (A_lo, A_hi) face coefs
        scaled by Jinv/dz^2, edge rows zeroed."""
        grid, geo = self.grid, self.geo
        dvert = grid.vertical_dir
        if grid.axis(dvert) != 0:
            return None   # 1D flattened grids have no vertical line solve
        dz = grid.dx[dvert]
        nz = grid.shape[0]
        Jg = geo.Jgup_diag[dvert] * jnp.ones(grid.fc_shape(dvert))
        scale = geo.Jinv / (dz * dz)
        a = (slc(Jg, 0, 0, -1) * scale).at[0].set(0.0)
        c = (slc(Jg, 0, 1, None) * scale).at[nz - 1].set(0.0)
        return (a, c)

    def _vertical_line_parts(self):
        return self._line_coefs

    def relax_line_vertical(self, phi, rhs, alpha, beta, iters: int,
                            jgup_delta=None):
        """Vertical line relaxation: exact tridiagonal solve along z per
        column with horizontal terms lagged (reference: LineGSRB).  The
        line-block diagonal is the FULL operator diagonal — dropping the
        horizontal self-coupling makes line-constant modes diverge."""
        from somar_tpu.solvers.tridiag import thomas_solve

        grid = self.grid
        a_s, c_s = self._vertical_line_parts()
        a = beta * a_s
        c = beta * c_s
        if jgup_delta is not None and jgup_delta[0] is not None:
            dvert = grid.vertical_dir
            dd = jgup_delta[0][dvert]
            if dd is not None:
                dz = grid.dx[dvert]
                Jg = dd * jnp.ones(grid.fc_shape(dvert))
                scale = self.geo.Jinv / (dz * dz)
                nz = grid.shape[0]
                a = a + beta * (slc(Jg, 0, 0, -1) * scale).at[0].set(0.0)
                c = c + beta * (slc(Jg, 0, 1, None) * scale).at[nz - 1].set(0.0)
        b = self.diag(alpha, beta, jgup_delta) * jnp.ones(grid.shape)
        red, black = self._rb_masks
        inv_diag = 1.0 / b

        def body(_, p):
            # line solve kills vertical error; the GSRB sweep smooths the
            # horizontal high frequencies the line solve cannot (pure line
            # relaxation stalls MG once coarsening equalizes anisotropy)
            r = self.residual(p, rhs, alpha, beta, jgup_delta=jgup_delta)
            p = p + thomas_solve(a, b, c, r)
            for mask in (red, black):
                r = self.residual(p, rhs, alpha, beta, jgup_delta=jgup_delta)
                p = jnp.where(mask, p + inv_diag * r, p)
            return p

        return jax.lax.fori_loop(0, iters, body, phi)

    def relax(self, phi, rhs, alpha, beta, iters: int, mode: str = "gsrb",
              jgup_delta=None, delta_overrides=None):
        if mode == "jacobi":
            return self.relax_jacobi(phi, rhs, alpha, beta, iters,
                                     jgup_delta=jgup_delta)
        if mode == "gsrb":
            return self.relax_gsrb(phi, rhs, alpha, beta, iters,
                                   jgup_delta=jgup_delta,
                                   delta_overrides=delta_overrides)
        if mode == "line":
            return self.relax_line_vertical(phi, rhs, alpha, beta, iters,
                                            jgup_delta=jgup_delta)
        if mode == "none":
            return phi
        raise ValueError(f"unknown relax mode {mode}")

    # ---------------------------------------------------------------- misc
    def norm(self, r, p: int = 2):
        if p == 0:
            return jnp.max(jnp.abs(r))
        return jnp.sqrt(jnp.mean(r.astype(jnp.float32) ** 2))

    def bcs_singular(self) -> bool:
        """True when the BCs admit the constant null space (all Neumann /
        periodic / extrap); the operator is then singular iff alpha == 0."""
        for d in range(self.grid.ndim):
            for bc in (self.bcs.lo[d], self.bcs.hi[d]):
                if bc.type == BCType.DIRICHLET:
                    return False
        return True
