"""Incompressibility projections: MAC (exact) and CC (approximate).

Re-design of the reference's projection layer
(`/root/reference/src/projection/BaseProjector.H:35` template method:
computeDiv -> solve -> computeGrad -> applyCorrection;
LevelMACProjector.H:39, LevelCCProjector.H:38, AMRPressureSolver.H:43).

Scaling conventions (flux form):
  * A MAC velocity is the J-scaled contravariant flux F_d = J u^d on faces.
  * mac_divergence(F) = (1/J) sum_d diff(F_d)/dx_d.
  * The pressure Poisson problem: L[phi] = mac_divergence(F*) with
    L = (1/J) d_d (J g^{dj} d_j phi)  — the same PoissonOp as everywhere;
    correction F -= mac_gradient(phi) then gives mac_divergence(F) == 0
    to solver tolerance (exact level projection).
  * The CC projection is the standard approximate projection: velocity is
    averaged to faces, projected, and the face-averaged correction is
    subtracted at CC.

The pressure solver mux (reference AMRPressureSolver: leptic vs MG vs
BiCGStab per static flags) is the `method` knob; the leptic method is
wired in once the leptic solver lands.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from somar_tpu.core.bc import BC, BCType, FieldBCs
from somar_tpu.geometry.level_geometry import LevelGeometry
from somar_tpu.core.bc import fill_ghosts_cc
from somar_tpu.ops.stencil import (
    cc_to_fc, fc_to_cc, mac_divergence, mac_gradient,
    mac_gradient_prepadded)
from somar_tpu.solvers.multigrid import LevelMultigrid, MGParams
from somar_tpu.solvers.poisson_op import PoissonOp
from somar_tpu.solvers.bicgstab import bicgstab, BiCGStabParams


def pressure_bcs(grid, vel_bcs_normal: Optional[Sequence[FieldBCs]] = None) -> FieldBCs:
    """Pressure-Poisson BCs: periodic where the domain is, homogeneous
    Neumann elsewhere (normal velocity is prescribed at physical
    boundaries; reference: PhysBCUtil::MacPressureFuncBC)."""
    return FieldBCs.from_periodic(grid, BC.neumann(0.0))


class LevelProjector:
    """Owns one MG hierarchy for the pressure Poisson solves on a level.

    Reference: LevelMACProjector + LevelCCProjector share the
    AMRPressureSolver; here both projections share one LevelMultigrid.
    """

    def __init__(self, geo: LevelGeometry, mg_params: MGParams = MGParams(),
                 phi_bcs: Optional[FieldBCs] = None, method: str = "auto",
                 dtype=jnp.float32, mg_params_by_purpose: Optional[dict] = None):
        """mg_params_by_purpose: optional {"mac"|"cc"|"sync"|"vd":
        MGParams} overrides (reference: the per-projection AMRMG/bottom
        namespaces consumed by AMRPressureSolver's per-context builds);
        missing purposes fall back to mg_params."""
        self.geo = geo
        self.grid = geo.grid
        self.phi_bcs = phi_bcs or pressure_bcs(geo.grid)
        self._mg_params = mg_params
        self._mg_by_purpose = dict(mg_params_by_purpose or {})
        self._dtype = dtype
        self._mg = None       # built lazily (the spectral path skips it)
        self._mgs = {}        # per-purpose lazy LevelMultigrid overrides
        self.op = PoissonOp(geo, self.phi_bcs)
        self.singular = self.op.bcs_singular()
        # solver mux (reference: AMRPressureSolver leptic/MG/BiCGStab flags,
        # AMRPressureSolver.cpp:39-40) + the TPU-only spectral fast path
        self.fft = None
        if method == "auto":
            from somar_tpu.solvers.fft_poisson import FFTPoissonSolver
            if FFTPoissonSolver.supports(geo, self.phi_bcs):
                self.fft = FFTPoissonSolver(geo, self.phi_bcs, dtype)
                method = "fft"
            else:
                # mapped metrics ride MG with the fused probed-stencil
                # GSRB kernels.  The leptic expansion
                # (projection.solver=leptic) stays OPT-IN: although the
                # reference built it for exactly the flat-aspect regime
                # (LevelLepticSolver.H:41-52), the kernelized MG measures
                # 7.0 ms vs leptic's 107 ms on the BeamGeneration
                # 640x512 metric on a TPU v5e chip — MPI-era
                # latency-hiding tradeoffs don't transfer to one big
                # vector core (see docs/STATUS.md round-4 log)
                method = "mg"
        elif method == "fft":
            from somar_tpu.solvers.fft_poisson import FFTPoissonSolver
            self.fft = FFTPoissonSolver(geo, self.phi_bcs, dtype)
        elif method == "leptic":
            from somar_tpu.solvers.leptic import LevelLepticSolver
            self.leptic = LevelLepticSolver(geo, self.phi_bcs, dtype=dtype)
        self.method = method

    @property
    def mg(self) -> LevelMultigrid:
        if self._mg is None:
            self._mg = LevelMultigrid(self.geo, self.phi_bcs,
                                      params=self._mg_params,
                                      dtype=self._dtype)
        return self._mg

    def _params_for(self, purpose) -> MGParams:
        return self._mg_by_purpose.get(purpose, self._mg_params)

    def _mg_for(self, purpose) -> LevelMultigrid:
        if purpose not in self._mg_by_purpose:
            return self.mg
        if purpose not in self._mgs:
            self._mgs[purpose] = LevelMultigrid(
                self.geo, self.phi_bcs,
                params=self._mg_by_purpose[purpose], dtype=self._dtype)
        return self._mgs[purpose]

    # ----------------------------------------------------------- solves
    def _solve(self, rhs, phi0=None, jgup_deltas=None, purpose="mac"):
        if self.method == "fft" and jgup_deltas is None:
            # exact spectral solve (uniform Cartesian metric, hom BCs)
            return self.fft.solve(rhs), (jnp.asarray(1), jnp.asarray(0.0))
        if self.method == "leptic" and jgup_deltas is None:
            phi, (it, rr, status) = self.leptic.solve_with_fallback(
                rhs, phi0)
            return phi, (it, rr)
        if self.method == "bicgstab":
            jd0 = jgup_deltas[0] if jgup_deltas is not None else None
            mp = self._params_for(purpose)
            bp = BiCGStabParams(eps=mp.bottom_eps,
                                imax=mp.bottom_imax,
                                hang=mp.bottom_hang,
                                small=mp.bottom_small,
                                num_restarts=mp.bottom_num_restarts)
            if self.singular:
                rhs = self.op.compat_project(rhs)
            return bicgstab(
                lambda v: self.op.apply(v, jgup_delta=jd0), rhs, x0=phi0,
                params=bp, remove_mean=self.singular)
        return self._mg_for(purpose).solve(rhs, phi0=phi0,
                                           singular=self.singular,
                                           jgup_deltas=jgup_deltas)

    # ------------------------------------------------------------- helpers
    def cc_grad_cart(self, phi):
        """Cartesian-basis CC gradient of a CC potential via face-average
        of the MAC gradient (the same discrete gradient the projection
        subtracts, so lagged-pressure terms telescope exactly)."""
        geo, grid = self.geo, self.grid
        grad_fc = mac_gradient(phi, geo, self.phi_bcs)
        grad_cc = jnp.stack([
            fc_to_cc(grad_fc[d], d, grid) * geo.Jinv
            for d in range(grid.ndim)])
        return geo.to_cartesian(grad_cc)

    # ------------------------------------------------------------- rings
    def _grad_with_ring(self, phi, ring, jd0=None):
        """MAC gradient of phi whose ghost ring carries coarse-fine data:
        the padded potential is fill_ghosts(phi) + ring (ring is a
        padded-shape array, zero in the interior and on non-CF sides)."""
        p = fill_ghosts_cc(phi, self.grid, self.phi_bcs, 1)
        if ring is not None:
            p = p + ring
        return mac_gradient_prepadded(p, self.geo, jgup_delta=jd0)

    def _rhs_ring_correction(self, ring, jd0=None):
        """L(ring-only potential): folds inhomogeneous CF ghost data into
        the RHS by linearity (the CF analog of the BC fold in
        LevelMultigrid.solve(homogeneous=False))."""
        grad = mac_gradient_prepadded(ring, self.geo, jgup_delta=jd0)
        return mac_divergence(grad, self.geo)

    # ------------------------------------------------------ MAC projection
    def project_mac(self, fluxes: Sequence, phi0=None, ring=None):
        """Exact level projection of MAC fluxes F_d = J u^d.

        ring: optional padded-shape array of coarse-fine ghost potential
        values (AMR patch levels).  Returns (corrected fluxes, phi, info).
        Reference: LevelMACProjector::levelProject (call site
        AMRNavierStokesAdvancePPM.cpp:270-276).
        """
        div = mac_divergence(fluxes, self.geo)
        if ring is not None:
            div = div - self._rhs_ring_correction(ring)
        phi, info = self._solve(div, phi0, purpose="mac")
        grad = self._grad_with_ring(phi, ring)
        out = tuple(f - g for f, g in zip(fluxes, grad))
        return out, phi, info

    # ------------------------------------------------------- CC projection
    def cc_fluxes(self, vel_cart, vel_bcs: Sequence[FieldBCs]):
        """Face-averaged MAC fluxes J u^d of a CC Cartesian-basis
        velocity — the fluxes cc_div differences (exposed separately so
        the composite sync projection can build the flux-register-
        corrected COMPOSITE divergence, reference:
        Divergence::compDivergenceCC)."""
        geo, grid = self.geo, self.grid
        u_mapped = geo.to_mapped(vel_cart)
        return tuple(
            cc_to_fc(geo.mult_by_J(u_mapped[d]), d, grid, vel_bcs[d])
            for d in range(grid.ndim))

    def cc_div(self, vel_cart, vel_bcs: Sequence[FieldBCs]):
        """Divergence of the face-averaged MAC flux J u^d of a CC
        Cartesian-basis velocity — the CC-projection Poisson RHS."""
        return mac_divergence(self.cc_fluxes(vel_cart, vel_bcs), self.geo)

    def cc_correction(self, phi, ring=None, jd0=None):
        """Cartesian-basis CC correction velocity
        to_cartesian(g^{dj} d_j phi |_cc) for a solved potential (ring:
        optional CF ghost-potential data)."""
        geo, grid = self.geo, self.grid
        grad_fc = self._grad_with_ring(phi, ring, jd0)
        grad_cc = jnp.stack([
            fc_to_cc(grad_fc[d], d, grid) * geo.Jinv
            for d in range(grid.ndim)])     # contravariant g^{dj} d_j phi
        return geo.to_cartesian(grad_cc)

    def project_cc(self, vel_cart, vel_bcs: Sequence[FieldBCs], phi0=None,
                   scale: float = 1.0, jgup_deltas=None, ring=None,
                   purpose: str = "cc"):
        """Approximate projection of a CC Cartesian-basis velocity.

        vel -= scale * to_cartesian(g^{dj} d_j phi |_cc); the Poisson rhs
        is the divergence of the face-averaged J u^d.  Reference:
        LevelCCProjector / AMRNavierStokes::doCCProjection
        (AMRNavierStokesAdvancePPM.cpp:1513-1590).
        Returns (vel_corrected, phi, info).
        """
        jd0 = jgup_deltas[0] if jgup_deltas is not None else None
        div = self.cc_div(vel_cart, vel_bcs)
        if ring is not None:
            div = div - self._rhs_ring_correction(ring, jd0)
        phi, info = self._solve(div, phi0, jgup_deltas, purpose=purpose)
        corr = self.cc_correction(phi, ring, jd0)
        return vel_cart - scale * corr, phi, info
