"""Single-level incompressible Boussinesq Navier-Stokes: the PPM step.

Re-design of the reference's AMRNavierStokes advance path
(`/root/reference/src/NavierStokes/AMRNavierStokesAdvancePPM.cpp`):

  PPMTimeStep (:50-211)
    computeAdvectingVelocities (:218-300): CellToEdge + multByJ + trace +
      MAC projection
    getNewScalar (:379): trace + flux divergence + implicit diffusion
    getNewLambda (:306): freestream-preservation tracer advection
    getNewVelocity (:791-1352): predict, conservative div[u (x) u_adv],
      gravity/tidal/sponge forcing, implicit viscous update
    doCCProjection (:1513): approximate CC projection

All of it is one jitted function of (state, dt) — dt is traced, so the
step never recompiles as the CFL-controlled dt evolves.  Velocity state is
stored in the **Cartesian basis** at cell centers (the reference stores
the mapped basis and converts per stage, AMRNavierStokesAdvancePPM.cpp:
1395,1506; storing Cartesian lets every forcing term add directly and the
transforms constant-fold on Cartesian meshes).

The freestream tracer lambda (advected, should remain 1) provides the
volume-discrepancy diagnostic; its full AMR eLambda correction machinery
(AMRNavierStokesSync.cpp:850) activates with the multi-level hierarchy.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from somar_tpu.core.bc import BC, FieldBCs, apply_fc_bc
from somar_tpu.core.grid import Grid
from somar_tpu.geometry.level_geometry import LevelGeometry
from somar_tpu.ops.stencil import avg_along, cc_to_fc, mac_divergence, slc
from somar_tpu.physics.godunov import (
    ADVECT_GROW, AdvectionParams, flux_divergence, trace_face_states)
from somar_tpu.problems.base import Problem, tidal_source
from somar_tpu.projection.projector import LevelProjector
from somar_tpu.solvers.multigrid import MGParams
from somar_tpu.solvers.parabolic import make_heat_solver
from somar_tpu.solvers.poisson_op import PoissonOp


# --------------------------------------------------------------------------
# parameters (reference: the amr.* / advection.* namespaces, ProblemContext)
# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class NSParams:
    nu: float = 0.0                       # amr.viscosity
    kappa: Tuple[float, ...] = (0.0,)     # amr.scal_diffusion_coeffs
    viscous_solver_type: int = 1          # 0=BE 1=CN 2=TGA
    diffusive_solver_type: int = 1
    gravity_method: int = 1               # 0=none 1=explicit 2=implicit (IG)
    gravity_theta: float = 0.6            # IG implicitness (amr.gravity_theta)
    cfl: float = 0.8
    max_dt: float = 1.0e8
    max_dt_grow: float = 1.5
    init_dt_multiplier: float = 0.1
    fixed_dt: float = -1.0
    limit_dt_via_viscosity: bool = True
    limit_dt_via_diffusion: bool = True
    limit_dt_via_pressure_gradient: bool = False
    limit_dt_via_internal_wave_speed: bool = False
    nonlinear_differencing_form: int = 0  # -1 none, 0 conservative, 1 advective
    update_scheme: str = "ppm"            # amr.updateScheme: "ppm" | "rk3"
    advection_vel: AdvectionParams = AdvectionParams(use_limiting=False)
    advection_scal: AdvectionParams = AdvectionParams(use_limiting=True)
    mg: MGParams = MGParams()
    #: per-solver MG/bottom overrides (reference: the layered
    #: MACprojection_AMRMG.*, CCprojection_AMRMG.*, syncProjection_*,
    #: VD_*, viscous_* namespaces, ProblemContext.cpp:1243-1795);
    #: None falls back to `mg`
    mg_mac: Optional[MGParams] = None
    mg_cc: Optional[MGParams] = None
    mg_sync: Optional[MGParams] = None
    mg_vd: Optional[MGParams] = None
    mg_viscous: Optional[MGParams] = None
    mg_diffusive: Optional[MGParams] = None
    is_incompressible: bool = True        # projection.isIncompressible
    #: pressure solver mux (reference AMRPressureSolver's static
    #: s_useAMRLepticSolver / s_useAMRMGSolver flags, AMRPressureSolver
    #: .cpp:39-40): "auto" (spectral fast path else MG), "mg", "leptic",
    #: "bicgstab", "fft"
    pressure_solver: str = "auto"
    #: projection.level_projection_iters: CC projection applications per
    #: step (ProblemContext.cpp:1368)
    level_projection_iters: int = 1
    dtype: object = jnp.float32


# --------------------------------------------------------------------------
# state pytree
# --------------------------------------------------------------------------
@partial(jax.tree_util.register_dataclass,
         data_fields=["vel", "scalars", "lam", "mac_phi", "cc_phi",
                      "pressure", "e_lambda", "time"],
         meta_fields=[])
@dataclasses.dataclass
class NSState:
    vel: jnp.ndarray                 # (ndim,)+shape, Cartesian CC
    scalars: jnp.ndarray             # (nscal,)+shape (comp 0 = buoyancy dev)
    lam: jnp.ndarray                 # freestream tracer
    mac_phi: jnp.ndarray             # last MAC projection potential
    cc_phi: jnp.ndarray              # last CC projection increment potential
    pressure: jnp.ndarray            # lagged CC pressure p (incremental form)
    e_lambda: jnp.ndarray            # VD/freestream potential (AMR sync)
    time: jnp.ndarray                # scalar


class NSLevel:
    """One level's Navier-Stokes integrator (reference: AMRNavierStokes)."""

    def __init__(self, geo: LevelGeometry, problem: Problem,
                 params: NSParams = NSParams(),
                 aux_fields: Optional[dict] = None):
        """aux_fields optionally precomputes the host-derived problem
        fields ("nsq_cc", "sponge_ramp", "sponge_targets") so the level
        can be constructed from a TRACED LevelGeometry (the mapped-AMR
        path rebuilds the patch level inside the jitted step with the
        metric as a traced operand)."""
        aux = aux_fields or {}
        self.geo = geo
        self.grid = geo.grid
        self.problem = problem
        self.params = params
        grid = self.grid
        ndim = grid.ndim

        self.is_viscous = params.nu > 0.0
        #: set by the AMR hierarchy when the volume-discrepancy correction
        #: is active (reference: s_etaLambda / grad_eLambda machinery)
        self.use_vd_correction = False
        # BC sets (reference: PhysBCUtil's ~25 holders collapse to these)
        self.vel_bcs_trace = problem.vel_bcs(grid, viscous=False)
        self.vel_bcs_visc = problem.vel_bcs(grid, viscous=self.is_viscous)
        self.scal_bcs = problem.scalar_bcs(grid)
        self.lam_bcs = FieldBCs.from_periodic(grid, BC.extrap(1))
        #: any callable (time-dependent) BC values? (reference:
        #: EllipticBCValueFunc takes time, EllipticBCInterface.H:52-64).
        #: When set, `advance` binds every BC value at the step's traced
        #: midpoint time — see _bound_time_bcs.
        self._time_bcs = (any(b.time_dependent for b in self.vel_bcs_trace)
                          or any(b.time_dependent
                                 for b in self.vel_bcs_visc)
                          or self.scal_bcs.time_dependent)

        # projection machinery (shared MG hierarchy)
        mg_purposes = {k: v for k, v in
                       (("mac", params.mg_mac), ("cc", params.mg_cc),
                        ("sync", params.mg_sync), ("vd", params.mg_vd))
                       if v is not None}
        self.projector = LevelProjector(geo, mg_params=params.mg,
                                        mg_params_by_purpose=mg_purposes,
                                        method=params.pressure_solver,
                                        dtype=params.dtype)

        # implicit viscous / diffusive solvers
        if self.is_viscous:
            self.visc_solvers = [
                make_heat_solver(params.viscous_solver_type, geo,
                                 self.vel_bcs_visc[m], params.nu,
                                 params.mg_viscous or params.mg,
                                 params.dtype)
                for m in range(ndim)]
            from somar_tpu.solvers.parabolic import BatchedSpectralHeat
            self._visc_batched = (
                BatchedSpectralHeat(self.visc_solvers)
                if BatchedSpectralHeat.supports(self.visc_solvers)
                else None)
        self.diff_solvers = []
        # diffusive TGA/CN solves use no-flux (adiabatic Neumann) walls,
        # not the tracing extrapolation fills (reference: the separate
        # diffusiveSolveFuncBC, e.g. HorizConvBCUtil.cpp:112-147)
        diff_bcs = getattr(problem, "diffusive_solve_bcs", None)
        diff_bcs = diff_bcs(grid) if callable(diff_bcs) else \
            FieldBCs.from_periodic(grid, BC.neumann(0.0))
        for comp in range(problem.num_scalars):
            kap = params.kappa[comp] if comp < len(params.kappa) else 0.0
            self.diff_solvers.append(
                make_heat_solver(params.diffusive_solver_type, geo,
                                 diff_bcs, kap,
                                 params.mg_diffusive or params.mg,
                                 params.dtype)
                if kap > 0.0 else None)

        # Laplacian op for explicit viscous source (per-component BCs)
        self._visc_ops = [PoissonOp(geo, self.vel_bcs_visc[m])
                          for m in range(ndim)]
        # time-dependent BC values + implicit solves: force the lazy MG
        # hierarchies into existence NOW so they are never constructed
        # inside a _bound_time_bcs scope (whose traced values would leak
        # into the cached ops across jit traces)
        if self._time_bcs:
            for hs in ((self.visc_solvers if self.is_viscous else [])
                       + [h for h in self.diff_solvers if h is not None]):
                if hs.bcs.time_dependent and hs._fft is None:
                    hs.mg  # noqa: B018 — build side effect

        # precomputed problem fields
        self._sponge_ramp = None
        if problem.sponge is not None:
            if "sponge_ramp" in aux:
                self._sponge_ramp = aux["sponge_ramp"]
                self._sponge_targets = aux["sponge_targets"]
            else:
                from somar_tpu.problems.base import sponge_ramp
                self._sponge_ramp = jnp.asarray(
                    sponge_ramp(grid, problem.sponge), params.dtype)
                self._sponge_targets = problem.sponge_targets(geo)
        if "nsq_cc" in aux:
            self._nsq_cc = aux["nsq_cc"]
        else:
            self._nsq_cc = (problem.nsq_cc(geo).astype(params.dtype)
                            if problem.use_background_scalar else None)
        # first-mode internal-wave phase speed per direction (reference:
        # initializeInternalWaveSpeed, AMRNavierStokesInit.cpp:255-310,
        # projected onto coordinate lines by ProjectPhaseSpeed,
        # StratUtilsF.ChF; consumed by the COMPUTEMINBVDT dt limit)
        self._c0i = None
        if (params.limit_dt_via_internal_wave_speed
                and self._nsq_cc is not None):
            self._c0i = self._internal_wave_speed()

        # implicit-gravity (BV) machinery: altered-metric fields per MG level
        self._altered_metric = None
        if params.gravity_method == 2 and problem.use_background_scalar:
            from somar_tpu.projection.altered_metric import AlteredMetric
            self._altered_metric = AlteredMetric(
                self.projector.mg, problem.background, params.dtype)

    def _internal_wave_speed(self):
        """Per-direction first-mode phase speed c0^d = c0 * max over
        horizontal j of |dxi^d/dx^j| (reference: solveVertEigenProblem +
        ProjectPhaseSpeed; the eigenproblem runs on the level-0 profile
        only, finer levels inherit it — AMRNavierStokesFill.cpp:711).
        Returns per-direction scalars (uniform maps) or CC arrays."""
        from somar_tpu.utils.strat import solve_vert_eigen_problem

        grid = self.grid
        vd = grid.vertical_dir
        vax = grid.axis(vd)
        nsq = np.asarray(self._nsq_cc)
        horiz_axes = tuple(a for a in range(nsq.ndim) if a != vax)
        prof = nsq.mean(axis=horiz_axes) if horiz_axes else nsq
        c, _ = solve_vert_eigen_problem(np.maximum(prof, 0.0),
                                        grid.dx[vd], 1)
        c0 = float(np.asarray(c).ravel()[0])
        if self.geo.einv_cc is None:
            return tuple(0.0 if d == vd else c0 for d in range(grid.ndim))
        einv = np.asarray(self.geo.einv_cc)   # (m, n, *shape)
        hdirs = [n for n in range(grid.ndim) if n != vd]
        return tuple(
            jnp.asarray(
                c0 * np.max([np.abs(einv[d, n]) for n in hdirs], axis=0),
                self.params.dtype)
            for d in range(grid.ndim))

    # ------------------------------------------------------------- set-up
    def initial_state(self) -> NSState:
        dtype = self.params.dtype
        shape = self.grid.shape
        vel = self.problem.vel_ic(self.geo).astype(dtype)
        scal = jnp.stack([
            self.problem.scalar_ic(self.geo, c)
            for c in range(self.problem.num_scalars)]).astype(dtype)
        return NSState(
            vel=vel, scalars=scal,
            lam=jnp.ones(shape, dtype),
            mac_phi=jnp.zeros(shape, dtype),
            cc_phi=jnp.zeros(shape, dtype),
            pressure=jnp.zeros(shape, dtype),
            e_lambda=jnp.zeros(shape, dtype),
            time=jnp.zeros((), dtype),
        )

    def post_initialize(self, state: NSState, num_proj: int = 2) -> NSState:
        """Initial projection iterations (reference:
        AMRNavierStokesInit::postInitialize, :376-388): project the IC
        velocity so the first step starts divergence-free."""
        if not self.params.is_incompressible:
            return state

        def run(state):
            vel = state.vel
            for _ in range(num_proj):
                vel, phi, _ = self.projector.project_cc(
                    vel, self.vel_bcs_trace)
            return dataclasses.replace(state, vel=vel)

        if self._time_bcs:
            with self._bound_time_bcs(state.time):
                return run(state)
        return run(state)

    def initialize_pressure(self, state: NSState, dt, iters: int = 2) -> NSState:
        """Converge the lagged pressure with dummy advances that keep only
        the pressure (reference: initializeGlobalPressure,
        AMRNavierStokesInit.cpp:1093)."""
        if not self.params.is_incompressible:
            return state
        for _ in range(iters):
            trial = self.advance(state, dt)
            state = dataclasses.replace(state, pressure=trial.pressure,
                                        mac_phi=trial.mac_phi,
                                        cc_phi=trial.cc_phi)
        return state

    # ----------------------------------------------------------- forcing
    def _gravity_source(self, scalars):
        """-b' zhat (reference: fillGravSource,
        AMRNavierStokesFill.cpp:627-659)."""
        ndim = self.grid.ndim
        src = [jnp.zeros(self.grid.shape, self.params.dtype)
               for _ in range(ndim)]
        if self.params.gravity_method == 1:   # explicit only; IG handles
            src[ndim - 1] = -scalars[0]       # gravity in the projection
        return src

    def _sponge_source(self, vel, scalars, dt):
        """Rayleigh damping toward targets (reference:
        fillSpongeLayerSrcTerm, PhysBCUtil.cpp:603)."""
        if self._sponge_ramp is None:
            return None, None
        coeff = self._sponge_ramp / (self.problem.sponge.time_coeff * dt)
        vtgt, stgt = self._sponge_targets
        vel_src = coeff * (vtgt - vel)
        scal_src = coeff * (stgt - scalars[0])
        return vel_src, scal_src

    def _viscous_source(self, vel):
        """Explicit nu*L(u) estimate for the predictor (reference:
        computeViscousSrc)."""
        if not self.is_viscous:
            return None
        return jnp.stack([
            self.params.nu * self._visc_ops[m].apply(
                vel[m], 0.0, 1.0, homogeneous=False)
            for m in range(self.grid.ndim)])

    # ----------------------------------------------- advecting velocities
    def _einv_fc(self, d):
        """dxi/dx averaged to d-faces (identity on uniform maps)."""
        geo = self.geo
        if geo.einv_cc is None:
            return None
        ax = self.grid.axis(d)
        pad = [(0, 0)] * (geo.einv_cc.ndim)
        pad[2 + ax] = (1, 1)
        padded = jnp.pad(geo.einv_cc, pad, mode="edge")
        return avg_along(padded, 2 + ax)

    def _J_fc(self, d):
        geo = self.geo
        if geo.Jgup_full is None and geo.is_uniform:
            return 1.0
        # J at faces: average CC J
        ax = self.grid.axis(d)
        Jcc = geo.J * jnp.ones(self.grid.shape)
        pad = [(0, 0)] * Jcc.ndim
        pad[ax] = (1, 1)
        return avg_along(jnp.pad(Jcc, pad, mode="edge"), ax)

    def compute_advecting_velocities(self, state: NSState, src_vel, dt,
                                     ring_mac=None):
        """Predict face-centered J u^d at t+dt/2 and MAC-project
        (reference: computeAdvectingVelocities,
        AMRNavierStokesAdvancePPM.cpp:218-300)."""
        grid, geo = self.grid, self.geo
        ndim = grid.ndim
        vel = state.vel
        u_mapped = geo.to_mapped(vel)

        # provisional advecting velocity for upwinding: averaged J u^d,
        # built PADDED (face-indexed) from the shared ADVECT_GROW pads via
        # same-shape face averages, NOT cc_to_fc: constructing (n+1)-face
        # arrays from 1-ghost shrinking slices poisons XLA's layout/fusion
        # choices for every consumer (measured ~16 ms/trace vs ~0.2 ms at
        # 512x128x128 on v5e).  The barrier keeps the pad graph from being
        # re-fused (duplicated) into each downstream consumer.
        from somar_tpu.core.bc import fill_ghosts_cc as _fill
        from somar_tpu.physics.godunov import _crop_faces, face_avg
        u_pad = getattr(self, "_u_pad", None)
        prov_pad = []
        for d in range(ndim):
            if geo.is_uniform and u_pad is not None:
                base = u_pad[d]
                scale = geo.J  # scalar on uniform maps
            else:
                base = _fill(geo.mult_by_J(u_mapped[d]), grid,
                             self.vel_bcs_trace[d], ADVECT_GROW)
                scale = 1.0
            prov_pad.append(scale * face_avg(base, grid.axis(d)))
        prov_pad = jax.lax.optimization_barrier(tuple(prov_pad))

        # predict each Cartesian component to faces (padded face-indexed).
        # The pre-Riemann face states are stashed: getNewVelocity's
        # momentum fluxes upwind the SAME traced states against the
        # projected advecting velocity, so the predictor runs once per
        # component per step instead of twice (the reference re-traces,
        # AMRNavierStokesAdvancePPM.cpp:1354 vs :791 — identical math,
        # twice the kernel work).  Per-field (unbatched) kernel sets: the
        # batched variant (trace_face_states_batched) moves the same HBM
        # bytes through 3x fewer launches but pays extra stack copies —
        # measured slightly slower at the 512 bench.
        if u_pad is None:
            u_pad = [_fill(u_mapped[d], grid, self.vel_bcs_trace[d],
                           ADVECT_GROW) for d in range(ndim)]
        predicted = []
        self._vel_pre_states = []
        for m in range(ndim):
            src_m = src_vel[m] if src_vel is not None else None
            # identity einv (uniform/Cartesian): the advecting flux on
            # d-faces reads only component m=d's Riemann output, so the
            # other directions' P3 kernels skip that padded-array store
            # (the pre-Riemann states are still emitted for the momentum
            # update's re-upwinding)
            rie_dirs = [m] if geo.einv_cc is None else None
            faces, pre = trace_face_states(
                vel[m], u_mapped, prov_pad, src_m, dt, geo,
                self.vel_bcs_trace[m], self.params.advection_vel,
                vel_bcs=self.vel_bcs_trace,
                u_pad=u_pad, return_pre_riemann=True, padded=True,
                rie_dirs=rie_dirs)
            predicted.append(faces)
            self._vel_pre_states.append(pre)

        # normal contravariant flux on d-faces: J * einv[d,m] * u_m,
        # cropped to valid faces for the MAC projection
        adv = []
        G = ADVECT_GROW
        for d in range(ndim):
            einv = self._einv_fc(d)
            Jf = self._J_fc(d)
            if einv is None:
                flux = _crop_faces(predicted[d][d], grid, d, G)
            else:
                flux = sum(einv[d, m]
                           * _crop_faces(predicted[m][d], grid, d, G)
                           for m in range(ndim))
            flux = Jf * flux if not geo.is_uniform else flux
            flux = apply_fc_bc(flux, d, grid, self.vel_bcs_trace[d])
            adv.append(flux)

        if self.params.is_incompressible:
            adv, mac_phi, _ = self.projector.project_mac(
                tuple(adv), phi0=state.mac_phi, ring=ring_mac)
            adv = tuple(apply_fc_bc(adv[d], d, grid, self.vel_bcs_trace[d])
                        for d in range(ndim))
        else:
            mac_phi = state.mac_phi
        if self.use_vd_correction:
            # freestream (volume-discrepancy) correction: += grad eLambda
            # (reference: AMRNavierStokesAdvancePPM.cpp:280-286).  On a
            # patch level the CF-type phi BC expects ring ghost data the
            # advance does not carry; with none, the ghost would read 0
            # and the outermost face gradient would spike to e/dx (the
            # round-3 multipatch lambda blow-up: |div grad e| ~ 50 in the
            # halo band vs ~0.05 interior).  The patch halo already holds
            # donor-filled coarse-consistent e_lambda, so a linear
            # extrapolation at the array edge is the accurate ghost
            # (reference computes grad_eLambda once with proper CF
            # interpolation and stores it, AMRNavierStokesSync.cpp:1011).
            from somar_tpu.core.bc import BC, BCType, FieldBCs
            from somar_tpu.ops.stencil import mac_gradient
            pb = self.projector.phi_bcs
            fix = lambda b: BC.extrap(1) if b.type == BCType.CF else b
            ebcs = FieldBCs(lo=tuple(fix(b) for b in pb.lo),
                            hi=tuple(fix(b) for b in pb.hi))
            grad_e = mac_gradient(state.e_lambda, self.geo, ebcs)
            adv = tuple(adv[d] + grad_e[d] for d in range(ndim))
        return tuple(adv), mac_phi

    # ------------------------------------------------------------ scalars
    def _advect_update(self, s, u_mapped, src, dt, bcs, params,
                       return_fluxes: bool = False, pre_states=None):
        """One field's advection term via the padded fast path: trace,
        Riemann, and flux products stay same-shape padded face-indexed
        against self._adv_pad (the projected advecting velocities embedded
        once per step), with one final crop in flux_divergence."""
        from somar_tpu.physics.godunov import (
            _crop_faces, divergence_from_partials, riemann_from_states)
        adv_pad = self._adv_pad
        if (pre_states is None and not return_fluxes
                and self.params.nonlinear_differencing_form == 0):
            # fully-fused fast path: the P3 kernels emit the per-direction
            # undivided flux differences directly (want_div)
            partials = trace_face_states(
                s, u_mapped, adv_pad, src, dt, self.geo, bcs, params,
                vel_bcs=self.vel_bcs_trace, u_pad=self._u_pad,
                padded=True, want_div=True)
            return divergence_from_partials(partials, self.geo)
        if pre_states is not None:
            faces = riemann_from_states(pre_states, adv_pad,
                                        upwind=params.use_upwinding)
        else:
            faces = trace_face_states(s, u_mapped, adv_pad, src, dt,
                                      self.geo, bcs, params,
                                      vel_bcs=self.vel_bcs_trace,
                                      u_pad=self._u_pad, padded=True)
        if self.params.nonlinear_differencing_form == 1:
            # advective form: div(u s) - s div(u)
            div_us = flux_divergence(faces, adv_pad, self.geo, padded=True)
            div_u = mac_divergence(self._adv_valid, self.geo)
            out = div_us - s * div_u
        else:
            out = flux_divergence(faces, adv_pad, self.geo, padded=True)
        if return_fluxes:
            # the physical interface fluxes J u^d s consumed by the
            # divergence — what the AMR flux registers accumulate
            # (reference: incrementCoarse/incrementFine operands)
            fluxes = tuple(
                _crop_faces(faces[d], self.grid, d, ADVECT_GROW)
                * self._adv_valid[d]
                for d in range(self.grid.ndim))
            return out, fluxes
        return out

    def _scalar_sources(self, state: NSState, dt):
        """Per-component CC source terms for the scalar traces (background
        advection w N^2 in explicit-gravity mode + sponge damping)."""
        _, sponge_s = self._sponge_source(state.vel, state.scalars, dt)
        srcs = []
        for c in range(self.problem.num_scalars):
            src = None
            if c == 0:
                parts = []
                if self._nsq_cc is not None and self._altered_metric is None:
                    # background advection: db'/dt += w * N^2 (explicit
                    # mode; the IG scheme applies it semi-implicitly)
                    parts.append(state.vel[self.grid.ndim - 1] * self._nsq_cc)
                if sponge_s is not None:
                    parts.append(sponge_s)
                if parts:
                    src = sum(parts)
            srcs.append(src)
        return srcs

    def get_new_scalars_and_lambda(self, state: NSState, dt,
                                   collect: Optional[dict] = None,
                                   adv_terms=None):
        """Advect + diffuse the scalars and the freestream tracer lambda
        (reference: getNewScalar / getNewLambda,
        AMRNavierStokesAdvancePPM.cpp:379-789, :306-377).  With `collect`
        (a dict), the per-component interface fluxes are stored under
        collect["scalars"] / collect["lam"] for AMR refluxing.

        adv_terms: optional precomputed advection terms
        (scal_terms, lam_term) — the sharded step's shard_map islands
        compute them with explicit halo exchange (parallel/sharded_step)."""
        assert adv_terms is None or collect is None
        u_mapped = None  # traces use the shared self._u_pad fills
        nscal = self.problem.num_scalars
        srcs = self._scalar_sources(state, dt)
        out = []
        fluxes_out = []
        for c in range(nscal):
            s = state.scalars[c]
            src = srcs[c]
            if adv_terms is not None:
                adv = adv_terms[0][c]
            else:
                adv = self._advect_update(s, u_mapped, src, dt,
                                          self.scal_bcs,
                                          self.params.advection_scal,
                                          return_fluxes=collect is not None)
            if collect is not None:
                adv, fl = adv
                fluxes_out.append(fl)
            total_src = -adv + (src if src is not None else 0.0)
            if self.diff_solvers[c] is not None:
                s_new, _ = self.diff_solvers[c].update(s, total_src, dt)
            else:
                s_new = s + dt * total_src
            out.append(s_new)
        if collect is not None:
            collect["scalars"] = tuple(fluxes_out)
        # the freestream tracer (conservative, no diffusion)
        if adv_terms is not None:
            adv = adv_terms[1]
        else:
            adv = self._advect_update(state.lam, u_mapped, None, dt,
                                      self.lam_bcs,
                                      self.params.advection_scal,
                                      return_fluxes=collect is not None)
        if collect is not None:
            adv, fl = adv
            collect["lam"] = fl
        lam = state.lam - dt * adv
        return jnp.stack(out), lam

    # ----------------------------------------------------------- velocity
    def get_new_velocity(self, state: NSState, u_mapped, adv_vel, src_vel,
                         grav, tidal, sponge_v, grad_p, dt,
                         collect: Optional[dict] = None, adv_terms=None):
        """Conservative momentum advection + forcing + implicit viscosity
        (reference: getNewVelocity, AMRNavierStokesAdvancePPM.cpp:791-1352).
        The momentum fluxes re-upwind the advecting-velocity prediction's
        pre-Riemann states against the projected velocity.

        adv_terms: optional precomputed per-component advection terms
        (the sharded step's shard_map islands)."""
        assert adv_terms is None or collect is None
        grid = self.grid
        ndim = grid.ndim
        new_vel = []
        fluxes_out = []
        pre = getattr(self, "_vel_pre_states", None)
        batched_adv = None
        if (adv_terms is None and collect is None and pre is not None
                and self.params.nonlinear_differencing_form == 0):
            # one fused P4 re-upwinding + flux-difference kernel per
            # direction for ALL components (godunov.py)
            from somar_tpu.physics.godunov import momentum_flux_divergence
            batched_adv = momentum_flux_divergence(
                pre, self._adv_pad, self.geo,
                upwind=self.params.advection_vel.use_upwinding)
        for m in range(ndim):
            src_m = src_vel[m] if src_vel is not None else None
            if batched_adv is not None:
                adv = batched_adv[m]
            elif adv_terms is not None:
                adv = adv_terms[m]
            else:
                adv = self._advect_update(state.vel[m], u_mapped, src_m, dt,
                                          self.vel_bcs_trace[m],
                                          self.params.advection_vel,
                                          return_fluxes=collect is not None,
                                          pre_states=(pre[m]
                                                      if pre is not None
                                                      else None))
            if collect is not None:
                adv, fl = adv
                fluxes_out.append(fl)
            force = grav[m]
            if grad_p is not None:
                force = force - grad_p[m]
            if tidal is not None:
                force = force + tidal[m]
            if sponge_v is not None:
                force = force + sponge_v[m]
            total_src = -adv + force
            if self.is_viscous and self._visc_batched is not None:
                new_vel.append(total_src)   # stacked + solved below
            elif self.is_viscous:
                u_new, _ = self.visc_solvers[m].update(state.vel[m],
                                                       total_src, dt)
                new_vel.append(u_new)
            else:
                new_vel.append(state.vel[m] + dt * total_src)
        if collect is not None:
            collect["vel"] = tuple(fluxes_out)
        if self.is_viscous and self._visc_batched is not None:
            # one batched spectral round-trip for all components
            return self._visc_batched.update(state.vel,
                                             jnp.stack(new_vel), dt)
        return jnp.stack(new_vel)

    # ------------------------------------------------------------ advance
    def advance(self, state: NSState, dt, rings=None,
                collect_fluxes: bool = False):
        """One time step: PPM predictor-corrector (reference: PPMTimeStep)
        or RK3 MOL (reference: RK3TimeStep) per update_scheme
        (AMRNavierStokesAdvance.cpp:130-150 dispatch).

        rings: optional dict(mac=..., cc=...) of padded-shape coarse-fine
        ghost-potential arrays (AMR patch levels).
        collect_fluxes: also return the advective interface fluxes
        {"vel": .., "scalars": .., "lam": ..} for AMR flux registers
        (reference: the incrementCoarse/incrementFine call sites in
        AMRNavierStokesAdvancePPM.cpp)."""
        if self._time_bcs:
            with self._bound_time_bcs(state.time + 0.5 * dt):
                return self._advance_inner(state, dt, rings, collect_fluxes)
        return self._advance_inner(state, dt, rings, collect_fluxes)

    def _bound_time_bcs(self, t):
        """Scope in which every callable (time-dependent) BC value is
        bound at traced time t (reference: EllipticBCValueFunc receives
        time, EllipticBCInterface.H:52-64).  Binding is a temporary
        attribute swap restored on exit so no tracers leak into the level
        object across jit traces; BC structural data (operator diagonals,
        face factors) depends only on BC *types*, so swapping values is
        trace-safe."""
        import contextlib

        @contextlib.contextmanager
        def scope():
            saved = []

            def swap(obj, name, val):
                saved.append((obj, name, getattr(obj, name)))
                setattr(obj, name, val)

            vt = tuple(b.at_time(t) for b in self.vel_bcs_trace)
            vv = tuple(b.at_time(t) for b in self.vel_bcs_visc)
            swap(self, "vel_bcs_trace", vt)
            swap(self, "vel_bcs_visc", vv)
            swap(self, "scal_bcs", self.scal_bcs.at_time(t))
            if self.is_viscous:
                for m, hs in enumerate(self.visc_solvers):
                    if hs.bcs.time_dependent:
                        swap(hs, "bcs", vv[m])
                        swap(hs._op, "bcs", vv[m])
                        if hs._mg is not None:
                            swap(hs._mg.ops[0], "bcs", vv[m])
                for m, op in enumerate(self._visc_ops):
                    if op.bcs.time_dependent:
                        swap(op, "bcs", vv[m])
            for hs in self.diff_solvers:
                if hs is not None and hs.bcs.time_dependent:
                    b = hs.bcs.at_time(t)
                    swap(hs, "bcs", b)
                    swap(hs._op, "bcs", b)
                    if hs._mg is not None:
                        swap(hs._mg.ops[0], "bcs", b)
            try:
                yield
            finally:
                for obj, name, val in reversed(saved):
                    setattr(obj, name, val)

        return scope()

    def _advance_inner(self, state: NSState, dt, rings=None,
                       collect_fluxes: bool = False):
        p = self.params
        if p.update_scheme == "rk3":
            from somar_tpu.physics.rk3 import advance_rk3
            if collect_fluxes:
                collect = {}
                out = advance_rk3(self, state, dt, collect=collect,
                                  rings=rings)
                return out, collect
            return advance_rk3(self, state, dt, rings=rings)
        grid = self.grid
        ring_mac = rings.get("mac") if rings else None
        ring_cc = rings.get("cc") if rings else None

        # source terms for the predictor
        grav = self._gravity_source(state.scalars)
        tidal = None
        if self.problem.tidal is not None:
            tidal = tidal_source(self.problem.tidal, grid.ndim,
                                 state.time, dt)
            tidal = [t * jnp.ones(grid.shape, p.dtype) for t in tidal]
        sponge_v, _ = self._sponge_source(state.vel, state.scalars, dt)
        visc_src = self._viscous_source(state.vel)
        # lagged pressure gradient (incremental pressure-correction: without
        # it the projection splitting is O(dt); reference lagged-pressure
        # branch PPMTimeStep:155-210)
        grad_p = (self.projector.cc_grad_cart(state.pressure)
                  if p.is_incompressible else None)

        # tuple, NOT jnp.stack: each component is consumed once (the
        # m-trace's source ghost fill) and stacking materializes a
        # (ndim,)+shape copy (~1.2 ms at the 512 bench, per profile)
        src_vel = tuple(
            (visc_src[m] if visc_src is not None else jnp.zeros(grid.shape, p.dtype))
            + grav[m]
            - (grad_p[m] if grad_p is not None else 0.0)
            + (tidal[m] if tidal is not None else 0.0)
            + (sponge_v[m] if sponge_v is not None else 0.0)
            for m in range(grid.ndim))

        u_mapped = self.geo.to_mapped(state.vel)
        # one shared ghost fill of the tracing velocities for all traces
        # (NO barrier: a pad duplicated into each consumer is only a
        # re-read of the unpadded source — forcing materialization here
        # measured ~7 ms SLOWER at the 512 bench)
        from somar_tpu.core.bc import fill_ghosts_cc
        self._u_pad = [fill_ghosts_cc(u_mapped[d], grid,
                                      self.vel_bcs_trace[d], ADVECT_GROW)
                       for d in range(grid.ndim)]
        adv_vel, mac_phi = self.compute_advecting_velocities(
            state, src_vel, dt, ring_mac=ring_mac)
        # padded face-indexed embedding of the projected advecting
        # velocities: all downstream traces/Riemanns/flux products stay
        # same-shape (one crop per field update) — see _advect_update
        from somar_tpu.physics.godunov import pad_valid_faces
        self._adv_valid = adv_vel
        self._adv_pad = tuple(pad_valid_faces(adv_vel[d], grid, d)
                              for d in range(grid.ndim))

        collect = {} if collect_fluxes else None
        scalars, lam = self.get_new_scalars_and_lambda(state, dt, collect)
        vel = self.get_new_velocity(state, u_mapped, adv_vel, src_vel,
                                    grav, tidal, sponge_v, grad_p, dt,
                                    collect)
        self._u_pad = None
        self._vel_pre_states = None
        self._adv_pad = None
        self._adv_valid = None

        cc_phi = state.cc_phi
        pressure = state.pressure
        if self._altered_metric is not None:
            vel, scalars, cc_phi = self._do_ig_projection(
                state, vel, scalars, dt)
            pressure = state.pressure + cc_phi / dt
        elif p.is_incompressible:
            for _ in range(max(1, p.level_projection_iters)):
                vel, cc_phi, _ = self.projector.project_cc(
                    vel, self.vel_bcs_trace, phi0=state.cc_phi,
                    ring=ring_cc)
            pressure = state.pressure + cc_phi / dt

        out = NSState(vel=vel, scalars=scalars, lam=lam, mac_phi=mac_phi,
                      cc_phi=cc_phi, pressure=pressure,
                      e_lambda=state.e_lambda, time=state.time + dt)
        # SOMAR_DEBUG_CHECKS=1 NaN sweep (trace-time no-op otherwise;
        # reference: checkForValidNAN after every substep)
        from somar_tpu.utils.debug import check_state
        out = check_state(out, "advance")
        if collect_fluxes:
            return out, collect
        return out

    # ------------------------------------------------- implicit gravity
    def _do_ig_projection(self, state: NSState, vel_star, scalars_star, dt):
        """Semi-implicit buoyancy + altered-metric projection (reference:
        doCCIGProjection, AMRNavierStokesAdvancePPMIG.cpp:143-395).

        In the Cartesian velocity basis the contravariant update
        u^i -= dt*Dinv*(dxi^i/dz)*btilde collapses to a purely vertical
        kick u_z -= dt*Dinv*btilde (the basis transform telescopes:
        sum_i (dx_m/dxi^i)(dxi^i/dz) = delta_{mz}); W = u_z directly.
        """
        p = self.params
        grid = self.grid
        theta = p.gravity_theta
        vert = grid.ndim - 1
        nsq = self._altered_metric.nsq_cc(self.geo, p.dtype)
        dt_theta = dt * theta
        dinv = 1.0 / (1.0 + dt_theta * dt_theta * nsq)

        b_old = state.scalars[0]
        b_new = scalars_star[0]
        w_theta = theta * vel_star[vert] + (1.0 - theta) * state.vel[vert]
        b_theta = theta * b_new + (1.0 - theta) * b_old
        btilde = b_theta + dt_theta * nsq * w_theta

        vel_star = vel_star.at[vert].add(-dt * dinv * btilde)

        cc_phi = state.cc_phi
        if p.is_incompressible:
            deltas = self._altered_metric.jgup_delta_list(dt_theta)
            vel_star, cc_phi, _ = self.projector.project_cc(
                vel_star, self.vel_bcs_trace, phi0=state.cc_phi,
                jgup_deltas=deltas)

        # semi-implicit buoyancy update with the projected velocity
        w_theta_new = (theta * vel_star[vert]
                       + (1.0 - theta) * state.vel[vert])
        b_new = b_new + dt * nsq * w_theta_new
        scalars_star = scalars_star.at[0].set(b_new)
        return vel_star, scalars_star, cc_phi

    # ---------------------------------------------------------------- dt
    def compute_dt(self, state: NSState):
        """CFL + viscous + diffusive + pressure-gradient dt limits
        (reference: computeDt, AMRNavierStokesUtil.cpp:553-760)."""
        p = self.params
        grid = self.grid
        if p.fixed_dt > 0.0:
            return jnp.asarray(p.fixed_dt, p.dtype)
        u_mapped = self.geo.to_mapped(state.vel)
        inv_dt = 1e-12
        for d in range(grid.ndim):
            inv_dt = jnp.maximum(
                inv_dt, jnp.max(jnp.abs(u_mapped[d])) / grid.dx[d])
        dt = p.cfl / inv_dt

        min_dx2 = min(dx * dx for dx in grid.dx)
        if p.limit_dt_via_viscosity and p.nu > 0.0:
            dt = jnp.minimum(dt, p.cfl * min_dx2 / (2 * grid.ndim * p.nu))
        if p.limit_dt_via_diffusion:
            for kap in p.kappa:
                if kap > 0.0:
                    dt = jnp.minimum(
                        dt, p.cfl * min_dx2 / (2 * grid.ndim * kap))
        if p.limit_dt_via_pressure_gradient:
            # |grad cc_phi| ~ dt*|grad p|; robust bound dt <= dx/sqrt(|dphi|)
            for d in range(grid.ndim):
                ax = grid.axis(d)
                dphi = jnp.max(jnp.abs(jnp.diff(state.cc_phi, axis=ax)))
                dt = jnp.minimum(
                    dt, grid.dx[d] / jnp.sqrt(jnp.maximum(dphi, 1e-30)))
        if p.limit_dt_via_internal_wave_speed and self._c0i is not None:
            # dt <= cfl * min_cells,d dx_d / (|u_d| + c0_d); the reference
            # COMPUTEMINBVDT bound max(|u+c0|, |u-c0|) = |u| + c0
            # (AMRNavierStokesUtil.cpp:713-752, AMRNSF.ChF)
            inv_bv = 1e-12
            for d in range(grid.ndim):
                tot = jnp.abs(u_mapped[d]) + self._c0i[d]
                inv_bv = jnp.maximum(inv_bv, jnp.max(tot) / grid.dx[d])
            dt = jnp.minimum(dt, p.cfl / inv_bv)
        return jnp.minimum(dt, p.max_dt).astype(p.dtype)

    # --------------------------------------------------------- diagnostics
    def total_energy(self, state: NSState):
        """Volume integral of (|u|^2 + b*z-ish potential) energy density
        (reference: AMRNavierStokesDerive::totalEnergy, :512 and
        COMPUTEENERGY kernel: 0.5|u|^2 - b*z summed with J dV)."""
        geo = self.geo
        ke = 0.5 * jnp.sum(state.vel * state.vel, axis=0)
        z = jnp.asarray(np.broadcast_to(
            geo.phys_coords_cc()[geo.ndim - 1], geo.grid.shape),
            self.params.dtype)
        pe = state.scalars[0] * z
        dv = float(np.prod(geo.grid.dx))
        return jnp.sum((ke + pe) * geo.J) * dv

    def cell_divergence(self, state: NSState):
        """Per-cell mapped divergence of the CC velocity (reference:
        getPlotData's divergence branch, AMRNavierStokesIO.cpp:1278)."""
        geo = self.geo
        u_mapped = geo.to_mapped(state.vel)
        fluxes = tuple(
            cc_to_fc(geo.mult_by_J(u_mapped[d]), d, self.grid,
                     self.vel_bcs_trace[d])
            for d in range(self.grid.ndim))
        return mac_divergence(fluxes, geo)

    def max_divergence(self, state: NSState):
        return jnp.max(jnp.abs(self.cell_divergence(state)))
