"""The leptic solver: perturbative vertical-line + horizontal-MG Poisson
iteration for very flat (leptic) domains.

Re-design of the reference's flagship anisotropic solver
(`/root/reference/src/calculus/LepticSolver/LevelLepticSolver.H:41-52`,
LevelLepticSolver.cpp — the order-by-order expansion loop at :750,
verticalLineSolver, computeVerticalExcess, horizontalSolver, Krylov
fallback :851-874; paper DOI cited at LevelLepticSolver.H:42, Scotti &
Santilli, "The leptic solver...").

Math: on domains with aspect ratio H/L = sqrt(eps) << 1, expand
phi = sum_k phi^(k) in eps.  Each order couples a per-column vertical
two-point BVP (with Neumann data) to a (D-1)-dimensional horizontal
Poisson problem for the column-incompatible part ("excess").  Iterating:

  repeat:
    r = rhs - L phi
    excess(x_h) = (integral_z J r dz) / (integral_z J dz)   # incompatible
    phi += vertical NN line solves of  d_z(Jg^zz d_z .) = J (r - excess)
    r = rhs - L phi
    phi += extrude( horizontal MG solve of  C phi_h = integral_z J r dz )
  until converged / maxOrder, where C = integral_z Jg^hh dz.

Each vertical pass is one batched tridiagonal solve over all columns (a
lax.scan with fully-vectorized horizontal planes — the TPU-ideal layout);
the horizontal pass is a (D-1)-dim multigrid on the flattened grid.  The
reference falls back to BiCGStab when the reduction hangs
(LevelLepticSolver.cpp:851); we expose the same `fallback` knob.

Exit statuses mirror LevelLepticSolver.H:160-168.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from somar_tpu.core.bc import BCType, FieldBCs
from somar_tpu.core.grid import Grid
from somar_tpu.geometry.level_geometry import LevelGeometry
from somar_tpu.geometry.raw_geometry import raw_level_geometry
from somar_tpu.ops.stencil import slc
from somar_tpu.solvers.bicgstab import bicgstab
from somar_tpu.solvers.multigrid import LevelMultigrid, MGParams
from somar_tpu.solvers.poisson_op import PoissonOp
from somar_tpu.solvers.tridiag import thomas_solve
from somar_tpu.utils.subspace import extrude, flatten_grid


class LepticStatus:
    NONE = 0
    CONVERGED = 1
    ITER = 2
    HANG = 3
    DIVERGE = 4
    KABOOM = 5


@dataclasses.dataclass(frozen=True)
class LepticParams:
    max_order: int = 8          # max vertical/horizontal sweep pairs
    eps: float = 1e-6           # relative residual target
    hang: float = 1e-2          # reduction-per-order below this = hang
    horiz_rhs_tol: float = 1e-12  # skip horizontal solve below this
    horiz_mg: MGParams = MGParams(eps=1e-2, imin=1, imax=4,
                                  num_smooth_down=2, num_smooth_up=2)


class LevelLepticSolver:
    """Single-level leptic iteration for L phi = rhs with Neumann/periodic
    BCs (the pressure-projection problem on flat ocean domains)."""

    def __init__(self, geo: LevelGeometry, bcs: FieldBCs,
                 params: LepticParams = LepticParams(), dtype=jnp.float32):
        self.geo = geo
        self.bcs = bcs
        self.params = params
        self.dtype = dtype
        grid = geo.grid
        self.grid = grid
        vert = grid.vertical_dir
        assert grid.axis(vert) == 0
        self.op = PoissonOp(geo, bcs)

        # vertical line coefficients: Jg^zz at z-faces, per column
        Jg = geo.Jgup_diag[vert] * jnp.ones(grid.fc_shape(vert), dtype)
        self._A_lo = slc(Jg, 0, 0, -1)
        self._A_hi = slc(Jg, 0, 1, None)
        self._Jcc = geo.J * jnp.ones(grid.shape, dtype)
        self._dz = grid.dx[vert]

        # flattened horizontal geometry: C^hh = integral_z Jg^hh dz
        hgrid = flatten_grid(grid)
        h_coefs = []
        for i, d in enumerate(dh for dh in range(grid.ndim) if dh != vert):
            Jgh = geo.Jgup_diag[d] * jnp.ones(grid.fc_shape(d), dtype)
            h_coefs.append(jnp.sum(Jgh, axis=0) * self._dz)
        J_h = jnp.sum(self._Jcc, axis=0) * self._dz
        hgeo = raw_level_geometry(hgrid, J_h, h_coefs, dtype)
        h_bcs = FieldBCs(
            lo=tuple(bcs.lo[d] for d in range(grid.ndim) if d != vert),
            hi=tuple(bcs.hi[d] for d in range(grid.ndim) if d != vert))
        self.h_mg = LevelMultigrid(hgeo, h_bcs, params=params.horiz_mg,
                                   dtype=dtype)
        self._h_singular = self.h_mg.ops[0].bcs_singular()

        # vertical tridiagonal rows (times J r on the rhs):
        dz2 = self._dz * self._dz
        nz = grid.shape[0]
        a = self._A_lo / dz2
        c = self._A_hi / dz2
        a = a.at[0].set(0.0)
        c = c.at[nz - 1].set(0.0)
        b = -(a + c)
        # pin the top cell of each column (singular NN line); the mean is
        # re-gauged after the solve
        self._tri_a = a.at[0].set(0.0)
        self._tri_c = c.at[0].set(0.0)
        self._tri_b = b.at[0].set(1.0)
        self._fallback_mg = None   # lazy (ensure_compile_time_eval safe)

    # ------------------------------------------------------------ pieces
    def _vertical_sweep(self, r):
        """One batch of NN vertical line solves of d_z(A d_z x) = J*rc,
        rc = r - excess (column-compatible part)."""
        Jr = self._Jcc * r
        wsum = jnp.sum(self._Jcc, axis=0)
        excess = jnp.sum(Jr, axis=0) / wsum          # per column
        rhs = Jr - self._Jcc * excess[None, ...]
        rhs = rhs.at[0].set(0.0)                     # pinned row
        x = thomas_solve(self._tri_a, self._tri_b, self._tri_c, rhs)
        return x - jnp.mean(x, axis=0, keepdims=True)

    def _horizontal_sweep(self, r):
        """Flattened horizontal MG solve of C phi_h = integral J r dz."""
        rhs_h = jnp.sum(self._Jcc * r, axis=0) * self._dz
        # the flattened op divides by J_h; mac_divergence includes Jinv_h
        rhs_h = rhs_h / (jnp.sum(self._Jcc, axis=0) * self._dz)
        phi_h, _ = self.h_mg.solve(rhs_h, singular=self._h_singular)
        return extrude(phi_h, self.grid.shape[0])

    # ------------------------------------------------------------- solve
    def solve(self, rhs, phi0=None):
        """Returns (phi, (orders_used, relres, status))."""
        p = self.params
        rhs = rhs.astype(self.dtype)
        singular = self.op.bcs_singular()
        if singular:
            # J-weighted solvability projection (see PoissonOp.compat_project)
            rhs = self.op.compat_project(rhs)
        phi = jnp.zeros_like(rhs) if phi0 is None else phi0.astype(self.dtype)

        r0 = self.op.norm(self.op.residual(phi, rhs))
        r0 = jnp.maximum(r0, 1e-30)

        def accept(phi, rnorm, cand):
            """Accept-if-better: outside the expansion's regime (steep
            terrain, rough rhs) a sweep can overshoot — keep the best
            iterate so the fallback starts from it (reference: the
            DIVERGE exit abandons the order, LevelLepticSolver exit
            statuses .H:160-168)."""
            if singular:
                cand = cand - jnp.mean(cand)
            rcand = self.op.norm(self.op.residual(cand, rhs))
            better = rcand < rnorm
            return (jnp.where(better, cand, phi),
                    jnp.where(better, rcand, rnorm))

        def order_body(state):
            phi, rnorm, _, it = state
            r = self.op.residual(phi, rhs)
            phi, rnorm2 = accept(phi, rnorm, phi + self._vertical_sweep(r))
            r = self.op.residual(phi, rhs)
            phi, rnew = accept(phi, rnorm2,
                               phi + self._horizontal_sweep(r))
            return (phi, rnew, rnorm, it + 1)

        def order_cond(state):
            _, rnorm, rprev, it = state
            unconverged = rnorm > p.eps * r0
            not_hung = rnorm < (1.0 - p.hang) * rprev
            return (it < p.max_order) & unconverged & not_hung

        state = (phi, r0, 2.0 * r0, jnp.asarray(0))
        phi, rnorm, rprev, iters = jax.lax.while_loop(
            order_cond, order_body, state)

        status = jnp.where(
            rnorm <= p.eps * r0, LepticStatus.CONVERGED,
            jnp.where(iters >= p.max_order, LepticStatus.ITER,
                      jnp.where(rnorm > 2.0 * r0, LepticStatus.DIVERGE,
                                LepticStatus.HANG)))
        return phi, (iters, rnorm / r0, status)

    @property
    def fallback_mg(self) -> LevelMultigrid:
        """Line-relaxed semicoarsening MG on the same operator — the
        finisher when the expansion hangs or diverges (reference: the
        AMRPressureSolver holds BOTH the leptic and the MG solver and
        falls through to MG, AMRPressureSolver.cpp:39-40; the level
        solver's own Krylov branch LevelLepticSolver.cpp:851-874 is the
        BiCGStab variant, but unpreconditioned f32 BiCGStab stalls ~1e-2
        on terrain-following metrics where line-MG converges fully)."""
        if self._fallback_mg is None:
            self._fallback_mg = LevelMultigrid(
                self.geo, self.bcs,
                params=dataclasses.replace(self.params.horiz_mg,
                                           eps=self.params.eps, imax=20,
                                           num_smooth_down=4,
                                           num_smooth_up=4,
                                           relax_mode="line"),
                dtype=self.dtype)
        return self._fallback_mg

    def solve_with_fallback(self, rhs, phi0=None):
        """Leptic first; finish with line-relaxed MG if not converged."""
        phi, (iters, relres, status) = self.solve(rhs, phi0)
        singular = self.op.bcs_singular()
        if singular:
            rhs = self.op.compat_project(rhs)
        mg = self.fallback_mg

        def polish(phi):
            out, _ = mg.solve(rhs, phi0=phi, singular=singular)
            return out

        phi = jax.lax.cond(relres > self.params.eps, polish,
                           lambda x: x, phi)
        # report the TRUE residual of what we return: `relres` above is
        # the leptic attempt's, and quoting it after an MG polish made
        # the fallback look broken (measured: leptic relres 0.999 on an
        # incompatible random rhs while the polished phi was fine)
        rnorm = jnp.linalg.norm(rhs.ravel())
        rel_out = jnp.linalg.norm(
            (rhs - self.op.apply(phi)).ravel()) / jnp.maximum(rnorm, 1e-30)
        return phi, (iters, rel_out, status)
