"""Implicit viscous/diffusive integrators: Backward Euler, Crank-Nicolson, TGA.

Re-design of the reference's AMRParabolic layer
(`/root/reference/src/calculus/AMRParabolic/MappedBaseLevelHeatSolver.H:37`,
MappedLevelBackwardEuler.H:33, MappedLevelCrankNicolson.H:34,
MappedLevelTGA.H:35): each scheme advances  ds/dt = kappa * L s + S  one
step by one or two Helmholtz solves  (I - c*dt*kappa*L) s_new = rhs, where
L is the mapped Laplacian (PoissonOp with alpha=1, beta=-c*dt*kappa ...
we keep alpha/beta explicit below).  Solver selected per
`amr.viscous_solver_type` / `amr.diffusive_solver_type` (0=BE, 1=CN,
2=TGA; ProblemContext.H:141-151).

TGA (Twizell-Gumel-Arigu) is the 2nd-order L-stable scheme with
r1 = (2a - 1)/(a + discr), a = 2 - sqrt(2) - eps (reference constants at
AMRNavierStokes.H:53).

Each solve is a LevelMultigrid Helmholtz solve; the Helmholtz operator is
diagonally dominant so a handful of V-cycles converge fast.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp

from somar_tpu.core.bc import FieldBCs
from somar_tpu.geometry.level_geometry import LevelGeometry
from somar_tpu.solvers.multigrid import LevelMultigrid, MGParams
from somar_tpu.solvers.poisson_op import PoissonOp


class BaseHeatSolver:
    """Shared machinery: Helmholtz MG solves (I - c*dt*kappa*L) s = rhs.

    A single MG hierarchy serves every coefficient: alpha/beta are
    call-time operands of LevelMultigrid.solve, so a traced dt flows
    straight through the jitted step without retracing (the reference
    instead caches per-dt operator hierarchies,
    MappedBaseLevelHeatSolver)."""

    def __init__(self, geo: LevelGeometry, bcs: FieldBCs, kappa: float,
                 mg_params: MGParams = MGParams(), dtype=jnp.float32):
        self.geo = geo
        self.bcs = bcs
        self.kappa = float(kappa)
        self._mg_params = mg_params
        self._dtype = dtype
        self._mg = None      # built lazily (the spectral path skips it)
        self._op = PoissonOp(geo, bcs)
        # spectral fast path when the BCs/metric are eigen-decomposable
        from somar_tpu.solvers.fft_poisson import FFTPoissonSolver
        self._fft = (FFTPoissonSolver(geo, bcs, dtype)
                     if FFTPoissonSolver.supports(geo, bcs) else None)

    @property
    def mg(self) -> LevelMultigrid:
        if self._mg is None:
            self._mg = LevelMultigrid(self.geo, self.bcs,
                                      params=self._mg_params,
                                      dtype=self._dtype)
        return self._mg

    def _helmholtz_solve(self, rhs, coef, dt, phi0):
        """Solve (I - coef*dt*kappa*L) out = rhs."""
        beta = -coef * dt * self.kappa
        if self._fft is not None:
            return self._fft.solve(rhs, alpha=1.0, beta=beta), (1, 0.0)
        return self.mg.solve(rhs, phi0=phi0, alpha=1.0, beta=beta,
                             homogeneous=False, singular=False)

    def _apply_lap(self, s, homogeneous=False):
        return self._op.apply(s, 0.0, 1.0, homogeneous=homogeneous)


class BackwardEuler(BaseHeatSolver):
    """(I - dt kappa L) s^{n+1} = s^n + dt S   (reference:
    MappedLevelBackwardEuler)."""

    def update(self, s, src, dt):
        rhs = s + (dt * src if src is not None else 0.0)
        return self._helmholtz_solve(rhs, 1.0, dt, s)


class CrankNicolson(BaseHeatSolver):
    """(I - dt/2 kappa L) s^{n+1} = (I + dt/2 kappa L) s^n + dt S
    (reference: MappedLevelCrankNicolson).

    Spectral fast path: both the explicit (I + h L) application and the
    implicit solve are diagonal in the same eigenbasis, so the whole
    update is ONE forward + ONE inverse transform round-trip."""

    def update(self, s, src, dt):
        if self._fft is not None:
            f = self._fft
            h = 0.5 * dt * self.kappa
            num = (1.0 + h * f.lam) * f.fwd(s)
            if src is not None:
                num = num + dt * f.fwd(src)
            return f.inv(num / (1.0 - h * f.lam)), (1, 0.0)
        half = 0.5 * dt * self.kappa
        rhs = s + half * self._apply_lap(s) + (dt * src if src is not None else 0.0)
        return self._helmholtz_solve(rhs, 0.5, dt, s)


class TGA(BaseHeatSolver):
    """Twizell-Gumel-Arigu 2nd-order L0-stable two-stage scheme
    (reference: MappedLevelTGA.H:35; constants AMRNavierStokes.H:53).

    With a = 2 - sqrt(2) - eps and discr = sqrt(a^2 - 4a + 2):

        u^{n+1} = (I - mu1 k dt L)^{-1} (I - mu2 k dt L)^{-1}
                  [ (I + mu3 k dt L) u^n  +  dt (I + mu4 k dt L) S ]

        mu1 = (a - discr)/2,  mu2 = (a + discr)/2,
        mu3 = 1 - a,          mu4 = 1/2 - a.
    """

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        eps = 1e-8
        a = 2.0 - math.sqrt(2.0) - eps
        discr = math.sqrt(a * a - 4.0 * a + 2.0)
        self.mu1 = (a - discr) / 2.0
        self.mu2 = (a + discr) / 2.0
        self.mu3 = 1.0 - a
        self.mu4 = 0.5 - a

    def update(self, s, src, dt):
        kdt = self.kappa * dt
        if self._fft is not None:
            # every factor — the two explicit (I + mu*kdt L) applications
            # and the two implicit inverses — is diagonal in the SAME
            # eigenbasis, so the full two-stage update collapses to one
            # forward + one inverse transform with a combined diagonal
            # (lam <= 0 and mu1,mu2 > 0 keep the denominator >= 1).
            f = self._fft
            lam = f.lam
            num = (1.0 + self.mu3 * kdt * lam) * f.fwd(s)
            if src is not None:
                num = num + dt * (1.0 + self.mu4 * kdt * lam) * f.fwd(src)
            den = (1.0 - self.mu1 * kdt * lam) * (1.0 - self.mu2 * kdt * lam)
            return f.inv(num / den), (1, 0.0)
        rhs = s + self.mu3 * kdt * self._apply_lap(s)
        if src is not None:
            rhs = rhs + dt * (src + self.mu4 * kdt * self._apply_lap(src))
        mid, _ = self._helmholtz_solve(rhs, self.mu2, dt, s)
        return self._helmholtz_solve(mid, self.mu1, dt, mid)


def make_heat_solver(scheme: int, geo, bcs, kappa, mg_params=MGParams(),
                     dtype=jnp.float32) -> BaseHeatSolver:
    """scheme: 0=BackwardEuler, 1=CrankNicolson, 2=TGA (reference enum
    HeatSolverScheme, ProblemContext.H:141)."""
    cls = {0: BackwardEuler, 1: CrankNicolson, 2: TGA}[scheme]
    return cls(geo, bcs, kappa, mg_params, dtype)


class BatchedSpectralHeat:
    """Fused implicit update for C same-scheme, same-kappa heat solvers
    whose spectral fast paths all exist (the NS step's per-velocity
    -component viscous solves: same nu, different per-component BCs and
    hence different eigenbases).

    The C per-axis transform matrices stack into (C, n, n) batched MXU
    matmuls, so the whole vector update is ONE batched forward + inverse
    round-trip instead of C independent einsum chains (the reference
    solves per component too — AMRNavierStokesAdvancePPM.cpp:1260-1300 —
    because its MG has no batching concept)."""

    def __init__(self, solvers):
        s0 = solvers[0]
        self.scheme = type(s0)
        self.kappa = s0.kappa
        ffts = [s._fft for s in solvers]
        grid = s0.geo.grid
        # per array axis: stacked (C, n, n) transform matrices
        self.Qstacks = [
            (ax, jnp.stack([f.Q[i][1] for f in ffts]))
            for i, (ax, _) in enumerate(ffts[0].Q)]
        # per-axis (C,1,..,n,..,1) eigenvalue stacks; the full (C,)+shape
        # field is exposed lazily (see FFTPoissonSolver.lam)
        self.lam_axes = [
            jnp.stack([f.lam_axes[i] for f in ffts])
            for i in range(len(ffts[0].lam_axes))]
        self.dtype = s0._dtype
        # TGA constants when applicable
        if isinstance(s0, TGA):
            self.mus = (s0.mu1, s0.mu2, s0.mu3, s0.mu4)

    @property
    def lam(self):
        out = self.lam_axes[0]
        for l in self.lam_axes[1:]:
            out = out + l
        return out

    @staticmethod
    def supports(solvers) -> bool:
        if not solvers or any(s is None for s in solvers):
            return False
        s0 = solvers[0]
        if not all(type(s) is type(s0) and s.kappa == s0.kappa
                   and s._fft is not None for s in solvers):
            return False
        return type(s0) in (BackwardEuler, CrankNicolson, TGA)

    def _apply(self, x, transpose: bool):
        """x: (C,)+grid.shape; batched per-axis transform einsums.
        precision=HIGHEST: the MXU's default bf16 truncation costs ~2e-3
        relative error per transform (see FFTPoissonSolver._apply)."""
        from somar_tpu.solvers.fft_poisson import mxu_precision
        letters = "abcdefgh"[:x.ndim - 1]
        for ax, Qs in self.Qstacks:
            M = jnp.swapaxes(Qs, 1, 2) if transpose else Qs
            sub = (f"zK{letters[ax]},z{letters}->"
                   f"z{letters[:ax]}K{letters[ax + 1:]}")
            x = jnp.einsum(sub, M, x, precision=mxu_precision())
        return x

    def update(self, fields, srcs, dt):
        """fields/srcs: stacked (C,)+grid.shape (srcs may be None).
        Returns the stacked updated fields."""
        kdt = self.kappa * dt
        lam = self.lam
        s_hat = self._apply(fields.astype(self.dtype), False)
        f_hat = (self._apply(srcs.astype(self.dtype), False)
                 if srcs is not None else None)
        if self.scheme is TGA:
            mu1, mu2, mu3, mu4 = self.mus
            num = (1.0 + mu3 * kdt * lam) * s_hat
            if f_hat is not None:
                num = num + dt * (1.0 + mu4 * kdt * lam) * f_hat
            den = (1.0 - mu1 * kdt * lam) * (1.0 - mu2 * kdt * lam)
        elif self.scheme is CrankNicolson:
            h = 0.5 * kdt
            num = (1.0 + h * lam) * s_hat
            if f_hat is not None:
                num = num + dt * f_hat
            den = 1.0 - h * lam
        else:   # BackwardEuler
            num = s_hat if f_hat is None else s_hat + dt * f_hat
            den = 1.0 - kdt * lam
        return self._apply(num / den, True).astype(self.dtype)
