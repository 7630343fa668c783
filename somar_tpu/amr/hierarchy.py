"""The AMR hierarchy: subcycled multi-level advance on dense patches.

Re-design of the reference's AMR driver stack (LepticAMR::timeStep
recursive subcycling, `/root/reference/src/MappedChombo/LepticAMR.cpp:
957-1184`; AMRNavierStokes::postTimeStep sync,
`AMRNavierStokesSync.cpp:40-332`; regrid,
`AMRNavierStokesRegrid.cpp:688-966`) for the TPU data model:

  * A refined level is ONE dense rectangular patch of STATIC shape whose
    origin moves at regrid (host-side Berger-Rigoutsos clustering in C++,
    somar_tpu/native).  Static shapes keep the jitted step compiled once;
    the origin is a traced operand (lax.dynamic_slice).
  * The patch spans the full vertical extent (vertical tag extrusion,
    reference s_vert_extrude_tags — also what the terrain-following
    metric and vertical line solves want) and any periodic direction;
    remaining horizontal sides are coarse-fine (CF) interfaces.
  * CF ghosts: the patch carries an ADVECT_GROW halo refreshed from
    space-time-interpolated coarse data every substep (the dense analog
    of MappedPiecewiseLinearFillPatch); the halo bounds the domain of
    influence of one explicit substep, and implicit Helmholtz solves decay
    within it.  The elliptic projections are globally coupled, so they
    use the CF ghost-potential ring machinery (inhomogeneous Dirichlet
    ghost cells folded into the RHS).
  * Subcycling: nt = max(ratio) fine steps per coarse step (reference
    timeStep recursion), statically unrolled.
  * Synchronization: average-down of the fine interior onto the coarse
    level + sync CC projection (AMRNavierStokesSync.cpp:249-295).
    Refluxing registers are scaffolded; the shipped lock-exchange configs
    run with all reflux flags off (inputs.LockExchange_*: *_reflux = 0).

Round-1 restriction: uniform (Cartesian) coordinate maps — a moving patch
on a mapped grid would need origin-dependent metric rebuilds per regrid.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from somar_tpu.amr.tagging import TagParams, compute_tags, patch_origin_from_tags
from somar_tpu.amr.transfer import (
    extract_patch, insert_patch, prolong_linear, restrict_average, time_interp)
from somar_tpu.core.bc import BC, BCType, FieldBCs
from somar_tpu.core.grid import Grid
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.physics.godunov import ADVECT_GROW
from somar_tpu.physics.navier_stokes import NSLevel, NSParams, NSState
from somar_tpu.problems.base import Problem


def _replace_cf_sides(bcs: FieldBCs, cf_dirs, new_bc: BC) -> FieldBCs:
    lo = list(bcs.lo)
    hi = list(bcs.hi)
    for d in cf_dirs:
        lo[d] = new_bc
        hi[d] = new_bc
    return FieldBCs(lo=tuple(lo), hi=tuple(hi))


class PatchNSLevel(NSLevel):
    """NSLevel on the extended patch grid with CF sides.

    CF sides get EXTRAP(1) tracing fills (halo data is authoritative),
    CF-hom ghost cells for implicit/projection solves.
    """

    def __init__(self, geo, problem: Problem, params: NSParams,
                 cf_dirs: Tuple[int, ...]):
        super().__init__(geo, problem, params)
        grid = self.grid
        # override BCs on CF sides
        self.vel_bcs_trace = tuple(
            _replace_cf_sides(b, cf_dirs, BC.extrap(1))
            for b in self.vel_bcs_trace)
        self.vel_bcs_visc = tuple(
            _replace_cf_sides(b, cf_dirs, BC.cf(0.0))
            for b in self.vel_bcs_visc)
        self.scal_bcs = _replace_cf_sides(self.scal_bcs, cf_dirs,
                                          BC.extrap(1))
        self.lam_bcs = _replace_cf_sides(self.lam_bcs, cf_dirs, BC.extrap(1))

        # rebuild the solvers whose BCs changed
        from somar_tpu.projection.projector import LevelProjector, pressure_bcs
        from somar_tpu.solvers.parabolic import make_heat_solver
        from somar_tpu.solvers.poisson_op import PoissonOp

        phi_bcs = _replace_cf_sides(pressure_bcs(grid), cf_dirs, BC.cf(0.0))
        self.projector = LevelProjector(geo, mg_params=params.mg,
                                        phi_bcs=phi_bcs, dtype=params.dtype)
        if self.is_viscous:
            self.visc_solvers = [
                make_heat_solver(params.viscous_solver_type, geo,
                                 self.vel_bcs_visc[m], params.nu,
                                 params.mg, params.dtype)
                for m in range(grid.ndim)]
        self.diff_solvers = []
        diff_bcs = _replace_cf_sides(self.scal_bcs, cf_dirs, BC.cf(0.0))
        for comp in range(problem.num_scalars):
            kap = params.kappa[comp] if comp < len(params.kappa) else 0.0
            self.diff_solvers.append(
                make_heat_solver(params.diffusive_solver_type, geo,
                                 diff_bcs, kap, params.mg, params.dtype)
                if kap > 0.0 else None)
        self._visc_ops = [PoissonOp(geo, self.vel_bcs_visc[m])
                          for m in range(grid.ndim)]


class AMRHierarchy:
    """Two-level (base + one refined patch) subcycled hierarchy.

    Deeper hierarchies nest the same machinery level-by-level; the
    flagship configs (LockExchange, BeamGeneration) use maxlevel = 1.
    """

    def __init__(self, geo0, problem: Problem, params: NSParams,
                 ratio: Tuple[int, ...], tag_params: TagParams = TagParams(),
                 patch_frac: float = 0.5, eta_lambda: float = 0.0):
        assert geo0.is_uniform, (
            "round-1 AMR supports uniform (Cartesian) maps; mapped AMR "
            "requires origin-dependent metric rebuilds at regrid")
        self.level0 = NSLevel(geo0, problem, params)
        self.eta_lambda = float(eta_lambda)
        if self.eta_lambda > 0.0:
            self.level0.use_vd_correction = True
        self.grid0: Grid = geo0.grid
        self.problem = problem
        self.params = params
        self.ratio = tuple(int(r) for r in ratio)
        self.tag_params = tag_params
        self.nt = max(self.ratio)           # time refinement (subcycles)
        grid0 = self.grid0
        ndim = grid0.ndim

        # which dirs are CF (not spanned): non-periodic horizontal dirs
        self.span_dirs = tuple(
            d for d in range(ndim)
            if d == grid0.vertical_dir or grid0.periodic[d])
        self.cf_dirs = tuple(d for d in range(ndim)
                             if d not in self.span_dirs)
        H = ADVECT_GROW
        self.halo = H

        # static patch interior shape (fine cells), per logical dir
        interior = []
        for d in range(ndim):
            n_f = grid0.nx[d] * self.ratio[d]
            if d in self.span_dirs:
                interior.append(n_f)
            else:
                want = int(round(patch_frac * n_f))
                want = max(4 * H, (want // (2 * self.ratio[d]))
                           * (2 * self.ratio[d]))
                interior.append(min(want, n_f - 2 * H * self.ratio[d]))
        self.interior_nx = tuple(interior)
        ext = [interior[d] + (2 * H if d in self.cf_dirs else 0)
               for d in range(ndim)]
        self.ext_nx = tuple(ext)

        dx_f = tuple(grid0.dx[d] / self.ratio[d] for d in range(ndim))
        ext_grid = Grid(
            nx=self.ext_nx, dx=dx_f,
            x0=tuple(grid0.x0),   # placeholder; ICs never read patch coords
            periodic=tuple(grid0.periodic[d] and d in self.span_dirs
                           for d in range(ndim)))
        geo1 = build_level_geometry(ext_grid, geo0.geo, dtype=params.dtype)
        self.level1 = PatchNSLevel(geo1, problem, params, self.cf_dirs)
        self.ext_grid = ext_grid

        # halo mask (1 where CF halo) on the extended grid
        mask = np.zeros(ext_grid.shape, dtype=bool)
        for d in self.cf_dirs:
            ax = ext_grid.axis(d)
            sl = [slice(None)] * ndim
            sl[ax] = slice(0, H)
            mask[tuple(sl)] = True
            sl[ax] = slice(ext_grid.shape[ax] - H, None)
            mask[tuple(sl)] = True
        self._halo_mask = jnp.asarray(mask)

        # donor slab geometry (static, coarse cells per array axis):
        # CF axes carry a 1-coarse-cell margin each side (slopes + ring);
        # spanned axes take the full coarse extent.
        donor_shape = []
        for ax in range(ndim):
            d = grid0.dir_of_axis(ax)
            if d in self.cf_dirs:
                donor_shape.append(self.ext_nx[d] // self.ratio[d] + 2)
            else:
                donor_shape.append(grid0.nx[d])
        self.donor_shape_c = tuple(donor_shape)

        # current origin (host ints, per array axis, fine cells, of the
        # EXTENDED patch); None until first regrid
        self.origin_f: Optional[np.ndarray] = None

    # ---------------------------------------------------------------- util
    def _axis_ratio(self, ax: int) -> int:
        return self.ratio[self.grid0.dir_of_axis(ax)]

    def _donor_origin_c(self, origin_f):
        """Coarse-cell origin of the donor slab, per array axis (traced):
        one coarse cell outward on CF axes, 0 on spanned axes."""
        out = []
        for ax in range(self.grid0.ndim):
            d = self.grid0.dir_of_axis(ax)
            if d in self.cf_dirs:
                out.append(origin_f[ax] // self._axis_ratio(ax) - 1)
            else:
                out.append(jnp.zeros((), origin_f.dtype)
                           if hasattr(origin_f, "dtype") else 0)
        return tuple(out)

    def _interp_ext(self, coarse_field, origin_f, extra: int = 0):
        """Space-interpolate a coarse field onto the extended patch region
        (+`extra` <= min(ratio) fine cells each side: CF axes have donor
        margin; spanned axes edge-extend)."""
        grid0 = self.grid0
        donor = extract_patch(coarse_field, self._donor_origin_c(origin_f),
                              self.donor_shape_c)
        fine = prolong_linear(donor, grid0, self.ratio)
        if extra > 0:
            pads = []
            for ax in range(grid0.ndim):
                d = grid0.dir_of_axis(ax)
                pads.append((0, 0) if d in self.cf_dirs else (extra, extra))
            fine = jnp.pad(fine, pads, mode="edge")
        start = []
        shape = []
        for ax in range(grid0.ndim):
            d = grid0.dir_of_axis(ax)
            if d in self.cf_dirs:
                start.append(self.ratio[d] - extra)
            else:
                start.append(0)
            shape.append(self.ext_grid.shape[ax] + 2 * extra)
        return extract_patch(fine, tuple(start), tuple(shape))

    def _interp_state_ext(self, s0: NSState, origin_f) -> NSState:
        f = lambda arr: self._interp_ext(arr, origin_f)
        return NSState(
            vel=jnp.stack([f(s0.vel[m]) for m in range(self.grid0.ndim)]),
            scalars=jnp.stack([f(s0.scalars[c])
                               for c in range(s0.scalars.shape[0])]),
            lam=f(s0.lam),
            mac_phi=f(s0.mac_phi),
            cc_phi=f(s0.cc_phi) / self.nt,   # increment scales with dt
            pressure=f(s0.pressure),
            e_lambda=f(s0.e_lambda),
            time=s0.time,
        )

    def _overwrite_halo(self, s1: NSState, donor: NSState) -> NSState:
        m = self._halo_mask

        def mix(fine, c):
            return jnp.where(m, c.astype(fine.dtype), fine)

        return NSState(
            vel=mix(s1.vel, donor.vel),
            scalars=mix(s1.scalars, donor.scalars),
            lam=mix(s1.lam, donor.lam),
            mac_phi=mix(s1.mac_phi, donor.mac_phi),
            cc_phi=mix(s1.cc_phi, donor.cc_phi),
            pressure=mix(s1.pressure, donor.pressure),
            e_lambda=mix(s1.e_lambda, donor.e_lambda),
            time=s1.time,
        )

    def _ring(self, coarse_phi, origin_f, scale=1.0):
        """Padded-shape (ext+2) ghost-potential ring from a coarse field:
        interpolated values on the outermost layer of the CF sides, zero
        elsewhere (inhomogeneous CF Dirichlet data for the projections)."""
        ext1 = self._interp_ext(coarse_phi, origin_f, extra=1) * scale
        ring = jnp.zeros_like(ext1)
        for d in self.cf_dirs:
            ax = self.ext_grid.axis(d)
            n = ext1.shape[ax]
            sl = [slice(None)] * ext1.ndim
            sl[ax] = 0
            ring = ring.at[tuple(sl)].set(ext1[tuple(sl)])
            sl[ax] = n - 1
            ring = ring.at[tuple(sl)].set(ext1[tuple(sl)])
        # zero the corners that belong to non-CF sides' pad region is fine:
        # those sides' BC fills are added separately and the ring stays 0
        # there except on CF faces set above.
        return ring

    # ------------------------------------------------------------- advance
    def advance(self, s0: NSState, s1: NSState, origin_f, dt):
        """One coarse step + nt subcycled fine steps + synchronization.
        origin_f: per-array-axis fine-cell origin of the extended patch
        (traced int array).  Returns (s0_new, s1_new)."""
        level0, level1 = self.level0, self.level1
        nt = self.nt
        s0_old = s0
        s0_new = level0.advance(s0, dt)
        dt_f = dt / nt

        for i in range(nt):
            frac_mid = (i + 0.5) / nt
            frac0 = i / nt
            donor0 = time_interp(s0_old, s0_new, frac0)
            donor_ext = self._interp_state_ext(donor0, origin_f)
            s1 = self._overwrite_halo(s1, donor_ext)
            donor_mid = time_interp(s0_old, s0_new, frac_mid)
            rings = {
                "mac": self._ring(donor_mid.mac_phi, origin_f),
                "cc": self._ring(donor_mid.cc_phi, origin_f, 1.0 / nt),
            }
            s1 = level1.advance(s1, dt_f, rings=rings)

        s0_new = self.average_down(s0_new, s1, origin_f)
        # sync projection (reference: AMRNavierStokesSync.cpp:249-295)
        if self.params.is_incompressible:
            vel, cc_phi, _ = level0.projector.project_cc(
                s0_new.vel, level0.vel_bcs_trace, phi0=s0_new.cc_phi)
            s0_new = dataclasses.replace(s0_new, vel=vel)
        # volume-discrepancy (freestream) correction: eLambda potential
        # from the lambda drift (reference: computeVDCorrection,
        # AMRNavierStokesSync.cpp:850: rhs = etaLambda*(lambda-1)/dt,
        # grad eLambda added to the advecting velocity next step)
        if self.eta_lambda > 0.0:
            rhs = self.eta_lambda * (s0_new.lam - 1.0) / dt
            e_lam, _ = level0.projector._solve(rhs - jnp.mean(rhs))
            s0_new = dataclasses.replace(s0_new, e_lambda=e_lam)
        return s0_new, s1

    def average_down(self, s0: NSState, s1: NSState, origin_f) -> NSState:
        """Fine interior -> coarse (reference: MappedCoarseAverage +
        postTimeStep avgDown, AMRNavierStokesSync.cpp:71-165)."""
        grid0 = self.grid0
        H = self.halo
        ndim = grid0.ndim
        # fine interior block
        int_start = tuple(H if self.grid0.dir_of_axis(ax) in self.cf_dirs
                          else 0 for ax in range(ndim))
        int_shape = tuple(self.interior_nx[grid0.dir_of_axis(ax)]
                          for ax in range(ndim))
        origin_c = tuple((origin_f[ax] + int_start[ax]) //
                         self._axis_ratio(ax) for ax in range(ndim))

        def down(coarse, fine):
            block = extract_patch(fine, int_start, int_shape)
            avg = restrict_average(block, self.ext_grid, self.ratio)
            return insert_patch(coarse, avg, origin_c)

        return NSState(
            vel=jnp.stack([down(s0.vel[m], s1.vel[m])
                           for m in range(ndim)]),
            scalars=jnp.stack([down(s0.scalars[c], s1.scalars[c])
                               for c in range(s0.scalars.shape[0])]),
            lam=down(s0.lam, s1.lam),
            mac_phi=s0.mac_phi,
            cc_phi=s0.cc_phi,
            pressure=s0.pressure,
            e_lambda=s0.e_lambda,
            time=s0.time,
        )

    # -------------------------------------------------------------- regrid
    def initial_patch_state(self, s0: NSState):
        """Tag, choose the patch origin, and fill patch data from coarse
        (host-side; reference: initialGrid + regrid data fill)."""
        tags = compute_tags(s0, self.level0, self.tag_params)
        halo_axes = tuple(
            self.halo if self.grid0.dir_of_axis(ax) in self.cf_dirs else 0
            for ax in range(self.grid0.ndim))
        interior_axes = tuple(self.interior_nx[self.grid0.dir_of_axis(ax)]
                              for ax in range(self.grid0.ndim))
        origin = patch_origin_from_tags(tags, self.grid0, self.ratio,
                                        interior_axes, halo_axes)
        if origin is None:
            origin = np.array(
                [(self.grid0.nx[self.grid0.dir_of_axis(ax)]
                  * self._axis_ratio(ax) - self.ext_nx[
                      self.grid0.dir_of_axis(ax)]) // 2
                 for ax in range(self.grid0.ndim)], dtype=np.int64)
            for ax in range(self.grid0.ndim):
                r = self._axis_ratio(ax)
                origin[ax] = (origin[ax] // r) * r
        self.origin_f = np.asarray(origin, dtype=np.int64)
        s1 = self._interp_state_ext(s0, jnp.asarray(self.origin_f))
        return s1, jnp.asarray(self.origin_f)

    def regrid(self, s0: NSState, s1: NSState):
        """Re-tag and move the patch; data fill = coarse interpolation
        overwritten by old-patch data where the patches overlap
        (reference: AMRNavierStokesRegrid::regrid, :688-966)."""
        old_origin = None if self.origin_f is None else self.origin_f.copy()
        s1_new, origin = self.initial_patch_state(s0)
        if old_origin is not None:
            # overlap copy in fine index space (host ints -> static slices)
            new_o = self.origin_f
            lo = np.maximum(old_origin, new_o)
            hi = np.minimum(old_origin + np.asarray(self.ext_grid.shape),
                            new_o + np.asarray(self.ext_grid.shape))
            if np.all(hi > lo):
                src = tuple(slice(int(a), int(b)) for a, b in
                            zip(lo - old_origin, hi - old_origin))
                dst = tuple(slice(int(a), int(b)) for a, b in
                            zip(lo - new_o, hi - new_o))

                def copy_overlap(new, old):
                    lead = new.ndim - self.grid0.ndim
                    pre = (slice(None),) * lead
                    return new.at[pre + dst].set(old[pre + src])

                s1_new = jax.tree_util.tree_map(
                    lambda n, o: copy_overlap(n, o)
                    if n.ndim >= self.grid0.ndim else n,
                    s1_new, s1)
        return s1_new, origin

    # ------------------------------------------------------------------ dt
    def compute_dt(self, s0: NSState, s1: NSState):
        """Coarse dt limited so the subcycled fine level stays in CFL
        (reference: LepticAMR::assignDt, :854-947)."""
        dt0 = self.level0.compute_dt(s0)
        dt1 = self.level1.compute_dt(s1)
        return jnp.minimum(dt0, self.nt * dt1)
