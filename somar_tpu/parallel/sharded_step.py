"""Multi-chip Navier-Stokes step: shard_map advection islands + GSPMD solves.

The plain jitted step multi-chips two ways:
  * the jnp path auto-partitions under GSPMD (somar_tpu/parallel/mesh.py) —
    XLA inserts halo collective-permutes for every shifted slice; but
  * the Pallas CTU kernels (ops/pallas_kernels.py) are custom calls XLA's
    partitioner cannot split, so on a real multi-chip TPU they would force
    full gathers.

This module is the TPU-native analog of the reference's MPI domain
decomposition (SURVEY.md section 5.8: boxes -> ranks, Copier exchange()
halos): the advection pipeline runs inside `jax.shard_map` where each
shard advances its own sub-domain — a dense chunk extended by an
ADVECT_GROW halo refreshed with one `lax.ppermute` pair per field
(parallel/halo.py), exactly the structure the AMR PatchNSLevel already
uses for coarse-fine halos (amr/hierarchy.py).  The Pallas kernels then
run shard-locally on the extended blocks.  The elliptic solves (MAC/CC
pressure Poisson, implicit viscosity/diffusion) stay OUTSIDE shard_map as
global jnp programs that GSPMD partitions — multigrid relaxation shifts
and spectral einsum transforms shard natively.

Step structure (one jit of the whole thing):
  phase 0  global source terms (gravity, sponge, tidal, nu L(u), grad p)
  island A [shard_map]: halo-extend state; PPM/CTU-trace every field
           against the provisional advecting velocity; assemble the
           uncorrected MAC fluxes; return div(F*) + the pre-Riemann
           face-state stash (shard-stacked arrays)
  solve    L[phi] = div(F*)                       (GSPMD: FFT/MG/leptic)
  island B [shard_map]: extend phi; correct the MAC fluxes with the local
           mac-gradient; final Riemann upwinding of the stashed states;
           conservative flux divergences for vel/scalars/lambda
  phase C  implicit viscous/diffusive updates, forcing, CC (or
           implicit-gravity) projection, state assembly — the unmodified
           NSLevel methods with `adv_terms` injected.

The traced face states depend on the advecting velocity ONLY through the
final Riemann upwinding (godunov.trace_face_states), which is what lets
island A run before the MAC solve and island B stay shallow.

Correctness contract: each shard's results are bitwise what the
single-device step computes for the same cells (the ADVECT_GROW halo is
exactly the reference's ghost requirement, AdvectUtil.H:35); the global
MAC/CC solves are the very same solver objects.  The parity test
(tests/test_sharding.py) checks the full step against the single-device
answer on an 8-virtual-device mesh.

Scope: single-level, uniform (Cartesian) metric, PPM scheme,
conservative differencing; sharding over one ('x') or both ('y','x')
horizontal directions — the production 2D ICI-torus layout for 3D runs.
The vertical direction is never sharded (parallel/mesh.py layout policy).
For the AMR patch levels' shard-local kernel path see
amr/hierarchy.py PatchNSLevel + parallel/pallas_gate.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from somar_tpu.core.bc import (BC, BCType, FieldBCs, _ghost_block,
                               _set_slice, apply_fc_bc, fill_ghosts_cc)
from somar_tpu.core.grid import Grid
from somar_tpu.geometry.level_geometry import build_level_geometry
from somar_tpu.ops.stencil import face_avg, mac_divergence, \
    mac_gradient_prepadded, slc
from somar_tpu.parallel.halo import halo_exchange
from somar_tpu.parallel.pallas_gate import pallas_scope
from somar_tpu.physics.godunov import (ADVECT_GROW, _crop_faces,
                                       flux_divergence, pad_valid_faces,
                                       riemann_from_states,
                                       trace_face_states)
from somar_tpu.physics.navier_stokes import NSLevel, NSState
from somar_tpu.problems.base import tidal_source


def _replace_dir(bcs: FieldBCs, d: int, new_bc: BC) -> FieldBCs:
    lo = list(bcs.lo)
    hi = list(bcs.hi)
    lo[d] = new_bc
    hi[d] = new_bc
    return FieldBCs(lo=tuple(lo), hi=tuple(hi))


@dataclasses.dataclass(frozen=True)
class _ShardAxis:
    """One sharded direction of the mesh."""
    d: int          # logical direction
    ax: int         # array axis
    name: str       # mesh axis name
    k: int          # number of shards along this axis
    nloc: int       # owned cells per shard
    periodic: bool  # global periodicity of the direction


class ShardedNSStep:
    """Sharded advance() for one NSLevel over a 1- or 2-axis device mesh
    ('x', or the 2D ICI torus ('y','x') for 3D runs).

    Reference parallelism being replaced: Chombo SPMD LoadBalance +
    LevelData::exchange (somar.cpp:111-147, CopierCache.H:37-66).
    """

    #: mesh axis name -> logical direction (parallel/mesh.py layout)
    _DIR_OF_AXIS = {"x": 0, "y": 1}

    def __init__(self, level: NSLevel, mesh: Mesh):
        p = level.params
        assert level.geo.is_uniform, \
            "sharded step requires a uniform (Cartesian) metric"
        assert p.update_scheme == "ppm", "sharded step requires PPM"
        assert p.nonlinear_differencing_form == 0, \
            "sharded step requires conservative differencing"
        grid = level.grid
        self.level = level
        self.mesh = mesh
        H = ADVECT_GROW
        self.H = H
        self.sharded = []
        for name, k in zip(mesh.axis_names, mesh.devices.shape):
            assert name in self._DIR_OF_AXIS, \
                f"unknown mesh axis {name!r} (expected 'x'/'y')"
            k = int(k)
            if k == 1:
                continue   # degenerate axis: nothing to exchange
            d = self._DIR_OF_AXIS[name]
            assert grid.ndim == 3 or d == 0, \
                "2D domains shard only over x"
            assert grid.nx[d] % k == 0, \
                f"nx[{d}]={grid.nx[d]} not divisible by {k}"
            nloc = grid.nx[d] // k
            assert nloc >= H + 1, \
                f"need >= {H + 1} cells per shard along dir {d}"
            self.sharded.append(_ShardAxis(
                d=d, ax=grid.axis(d), name=name, k=k, nloc=nloc,
                periodic=grid.periodic[d]))
        self._by_dir = {s.d: s for s in self.sharded}

        # local extended grid: shard chunk + H authoritative halo cells
        # each side along every sharded direction (the PatchNSLevel halo
        # structure; x0 is per-shard-wrong but only metric-relevant, and
        # the metric is uniform)
        nx = list(grid.nx)
        periodic = list(grid.periodic)
        for s in self.sharded:
            nx[s.d] = s.nloc + 2 * H
            periodic[s.d] = False
        self.ext_grid = Grid(nx=tuple(nx), dx=grid.dx, x0=grid.x0,
                             periodic=tuple(periodic))
        self.ext_geo = build_level_geometry(self.ext_grid, level.geo.geo,
                                            dtype=p.dtype)
        # island-side trace BCs: EXTRAP(1) along the sharded directions
        # (halo data is authoritative — same convention as PatchNSLevel's
        # CF sides), the true problem BCs elsewhere
        vel_bcs = list(level.vel_bcs_trace)
        scal_bcs = level.scal_bcs
        lam_bcs = level.lam_bcs
        for s in self.sharded:
            vel_bcs = [_replace_dir(b, s.d, BC.extrap(1)) for b in vel_bcs]
            scal_bcs = _replace_dir(scal_bcs, s.d, BC.extrap(1))
            lam_bcs = _replace_dir(lam_bcs, s.d, BC.extrap(1))
        self.vel_bcs = tuple(vel_bcs)
        self.scal_bcs = scal_bcs
        self.lam_bcs = lam_bcs

        ndim = grid.ndim
        cc = [None] * ndim
        for s in self.sharded:
            cc[s.ax] = s.name
        self._spec_cc = P(*cc)
        self._spec_lead = P(*([None] + cc))

        self._ia = jax.shard_map(
            self._island_a, mesh=self.mesh,
            in_specs=(self._spec_lead, self._spec_lead, self._spec_cc,
                      self._spec_lead, self._spec_lead, P()),
            out_specs=self._spec_cc, check_vma=False)
        self._ib = jax.shard_map(
            self._island_b, mesh=self.mesh,
            in_specs=self._spec_cc, out_specs=self._spec_cc,
            check_vma=False)

    # -------------------------------------------------- halo + BC extension
    def _extend_one(self, f, s: _ShardAxis, bcs: FieldBCs, W: int):
        """Extend a local CC block along one sharded direction: W cells
        of neighbor data via ppermute, with the true physical-BC ghost
        formulas at the global edges (the shard-local equivalent of
        fill_ghosts_cc along that direction)."""
        ext = halo_exchange(f, s.name, s.ax, W, periodic=s.periodic)
        if not s.periodic:
            g = self.level.grid
            idx = jax.lax.axis_index(s.name)
            n = f.shape[s.ax]
            lo = _ghost_block(f, s.ax, bcs.lo[s.d], W, -1, g.dx[s.d])
            hi = _ghost_block(f, s.ax, bcs.hi[s.d], W, +1, g.dx[s.d])
            ext = jnp.where(idx == 0,
                            jnp.concatenate([lo, slc(ext, s.ax, W, None)],
                                            axis=s.ax), ext)
            ext = jnp.where(idx == s.k - 1,
                            jnp.concatenate([slc(ext, s.ax, 0, W + n), hi],
                                            axis=s.ax), ext)
        return ext

    def _extend(self, f, bcs: FieldBCs, width: Optional[int] = None):
        """Halo+BC extension along every sharded direction.  Sequential
        per-axis exchanges fill the corners: the second exchange moves
        the first one's halo columns too, so corners carry the diagonal
        neighbor's data (the Copier corner-exchange analog)."""
        W = self.H if width is None else width
        out = f
        for s in self.sharded:
            out = self._extend_one(out, s, bcs, W)
        return out

    def _crop_halo_cc(self, arr):
        """Ext-grid CC array -> the shard's own cells."""
        for s in self.sharded:
            arr = slc(arr, s.ax, self.H, self.H + s.nloc)
        return arr

    def _fc_bc(self, flux, dd: int):
        """apply_fc_bc on ext-valid faces: along unsharded directions the
        ext grid spans the domain; along a sharded direction the physical
        wall faces sit H in from the ext edges of the first/last shard."""
        bcs = self.level.vel_bcs_trace[dd]
        s = self._by_dir.get(dd)
        if s is None:
            return apply_fc_bc(flux, dd, self.ext_grid, bcs)
        if s.periodic:
            return flux
        idx = jax.lax.axis_index(s.name)
        if bcs.lo[dd].type == BCType.DIRICHLET:
            flux = jnp.where(idx == 0,
                             _set_slice(flux, s.ax, self.H,
                                        bcs.lo[dd].value),
                             flux)
        if bcs.hi[dd].type == BCType.DIRICHLET:
            flux = jnp.where(idx == s.k - 1,
                             _set_slice(flux, s.ax, self.H + s.nloc,
                                        bcs.hi[dd].value),
                             flux)
        return flux

    # ------------------------------------------------------------ island A
    def _island_a(self, *args):
        # shard-local by construction: the Pallas kernel paths are safe
        # here even on a multi-device mesh (parallel/pallas_gate.py)
        with pallas_scope(True):
            return self._island_a_body(*args)

    def _island_a_body(self, vel, scalars, lam, src_vel, src_scal, dt):
        """Shard-local: extend, trace every field (pre-Riemann states),
        assemble + pin the uncorrected MAC fluxes, return div(F*) and the
        stash.  Mirrors NSLevel.compute_advecting_velocities +
        _advect_update's trace stage on the extended grid."""
        lev = self.level
        g, geo = self.ext_grid, self.ext_geo
        ndim = g.ndim
        G = ADVECT_GROW

        velx = [self._extend(vel[m], lev.vel_bcs_trace[m])
                for m in range(ndim)]
        u_mapped = geo.to_mapped(jnp.stack(velx))
        u_pad = [fill_ghosts_cc(u_mapped[dd], g, self.vel_bcs[dd], G)
                 for dd in range(ndim)]
        prov_pad = tuple(geo.J * face_avg(u_pad[dd], g.axis(dd))
                         for dd in range(ndim))
        prov_pad = jax.lax.optimization_barrier(prov_pad)

        predicted = []
        pre_vel = []
        for m in range(ndim):
            src_m = self._extend(src_vel[m], lev.vel_bcs_trace[m])
            # uniform metric: only the normal component's Riemann output
            # feeds the MAC flux; skip the other dirs' P3 stores
            faces, pre = trace_face_states(
                velx[m], u_mapped, prov_pad, src_m, dt, geo,
                self.vel_bcs[m], lev.params.advection_vel,
                vel_bcs=self.vel_bcs, u_pad=u_pad,
                return_pre_riemann=True, padded=True, rie_dirs=[m])
            predicted.append(faces)
            pre_vel.append(pre)

        # uncorrected MAC fluxes (uniform metric: normal components)
        adv = []
        for dd in range(ndim):
            flux = _crop_faces(predicted[dd][dd], g, dd, G)
            adv.append(self._fc_bc(flux, dd))
        rhs = self._crop_halo_cc(mac_divergence(adv, geo))

        pre_scal = []
        for c in range(lev.problem.num_scalars):
            s_ext = self._extend(scalars[c], lev.scal_bcs)
            src_c = self._extend(src_scal[c], lev.scal_bcs)
            _, pre = trace_face_states(
                s_ext, None, prov_pad, src_c, dt, geo, self.scal_bcs,
                lev.params.advection_scal, vel_bcs=self.vel_bcs,
                u_pad=u_pad, return_pre_riemann=True, padded=True,
                rie_dirs=[])   # upwinding deferred to island B
            pre_scal.append(pre)
        lam_ext = self._extend(lam, lev.lam_bcs)
        _, pre_lam = trace_face_states(
            lam_ext, None, prov_pad, None, dt, geo, self.lam_bcs,
            lev.params.advection_scal, vel_bcs=self.vel_bcs,
            u_pad=u_pad, return_pre_riemann=True, padded=True,
            rie_dirs=[])

        return rhs, tuple(adv), tuple(pre_vel), tuple(pre_scal), pre_lam

    # ------------------------------------------------------------ island B
    def _island_b(self, *args):
        with pallas_scope(True):
            return self._island_b_body(*args)

    def _island_b_body(self, phi, adv, pre_vel, pre_scal, pre_lam):
        """Shard-local: correct the MAC fluxes with grad(phi), final
        Riemann of the stashed face states, conservative flux
        divergences."""
        lev = self.level
        g, geo = self.ext_grid, self.ext_geo
        ndim = g.ndim

        # phi on ext cells + one ghost ring (H+1 along the sharded dirs,
        # BC fills elsewhere) -> MAC gradient at all ext-valid faces
        phi_bcs = lev.projector.phi_bcs
        p = self._extend(phi, phi_bcs, width=self.H + 1)
        ngrow = [1] * ndim
        for s in self.sharded:
            ngrow[s.d] = 0
        p = fill_ghosts_cc(p, g, phi_bcs, tuple(ngrow))
        grad = mac_gradient_prepadded(p, geo)

        adv = tuple(self._fc_bc(adv[dd] - grad[dd], dd)
                    for dd in range(ndim))
        adv_pad = tuple(pad_valid_faces(adv[dd], g, dd)
                        for dd in range(ndim))

        def div_of(pre):
            faces = riemann_from_states(pre, adv_pad)
            return self._crop_halo_cc(
                flux_divergence(faces, adv_pad, geo, padded=True))

        vel_terms = tuple(div_of(pre_vel[m]) for m in range(ndim))
        scal_terms = tuple(div_of(pre_scal[c])
                           for c in range(lev.problem.num_scalars))
        lam_term = div_of(pre_lam)
        return vel_terms, scal_terms, lam_term

    # ------------------------------------------------------------- advance
    def advance(self, state: NSState, dt, rings=None) -> NSState:
        """One sharded time step — same math as NSLevel.advance (PPM).

        rings: optional dict(mac=..., cc=...) of padded-shape coarse-fine
        ghost-potential arrays (AMR patch levels).  The rings' effect on
        the SOLVES (RHS corrections, global GSPMD ops) is exact; their
        gradient contribution to the flux correction lives only on the
        outermost CF-halo faces of the patch array, whose divergences
        land in halo cells the subcycled advance overwrites from the
        donor every substep (amr/hierarchy.py _overwrite_halo) — so it
        is omitted from the shard-local islands.  Interior cells are
        bitwise the jnp path."""
        lev = self.level
        p = lev.params
        grid = lev.grid
        ndim = grid.ndim
        ring_mac = rings.get("mac") if rings else None
        ring_cc = rings.get("cc") if rings else None

        # phase 0: global source terms (identical to NSLevel.advance)
        grav = lev._gravity_source(state.scalars)
        tidal = None
        if lev.problem.tidal is not None:
            tidal = tidal_source(lev.problem.tidal, ndim, state.time, dt)
            tidal = [t * jnp.ones(grid.shape, p.dtype) for t in tidal]
        sponge_v, _ = lev._sponge_source(state.vel, state.scalars, dt)
        visc_src = lev._viscous_source(state.vel)
        grad_p = (lev.projector.cc_grad_cart(state.pressure)
                  if p.is_incompressible else None)
        src_vel = jnp.stack([
            (visc_src[m] if visc_src is not None
             else jnp.zeros(grid.shape, p.dtype))
            + grav[m]
            - (grad_p[m] if grad_p is not None else 0.0)
            + (tidal[m] if tidal is not None else 0.0)
            + (sponge_v[m] if sponge_v is not None else 0.0)
            for m in range(ndim)])
        srcs = lev._scalar_sources(state, dt)
        src_scal = jnp.stack([
            srcs[c] if srcs[c] is not None
            else jnp.zeros(grid.shape, p.dtype)
            for c in range(lev.problem.num_scalars)])

        # island A: trace everything, build the MAC rhs
        rhs, adv, pre_vel, pre_scal, pre_lam = self._ia(
            state.vel, state.scalars, state.lam, src_vel, src_scal,
            jnp.asarray(dt, p.dtype))

        # global MAC pressure solve (GSPMD: FFT / MG / leptic / BiCGStab)
        if p.is_incompressible:
            if ring_mac is not None:
                rhs = rhs - lev.projector._rhs_ring_correction(ring_mac)
            mac_phi, _ = lev.projector._solve(rhs, state.mac_phi)
        else:
            mac_phi = state.mac_phi

        # island B: correct fluxes, upwind, flux divergences
        vel_terms, scal_terms, lam_term = self._ib(
            mac_phi, adv, pre_vel, pre_scal, pre_lam)

        # phase C: the unmodified NSLevel updates with injected adv terms
        scalars, lam = lev.get_new_scalars_and_lambda(
            state, dt, adv_terms=(scal_terms, lam_term))
        vel = lev.get_new_velocity(state, None, None, src_vel, grav,
                                   tidal, sponge_v, grad_p, dt,
                                   adv_terms=vel_terms)

        cc_phi = state.cc_phi
        pressure = state.pressure
        if lev._altered_metric is not None:
            vel, scalars, cc_phi = lev._do_ig_projection(
                state, vel, scalars, dt)
            pressure = state.pressure + cc_phi / dt
        elif p.is_incompressible:
            for _ in range(max(1, p.level_projection_iters)):
                vel, cc_phi, _ = lev.projector.project_cc(
                    vel, lev.vel_bcs_trace, phi0=state.cc_phi,
                    ring=ring_cc)
            pressure = state.pressure + cc_phi / dt

        return NSState(vel=vel, scalars=scalars, lam=lam, mac_phi=mac_phi,
                       cc_phi=cc_phi, pressure=pressure,
                       e_lambda=state.e_lambda, time=state.time + dt)
