"""Flux registers: coarse-fine flux mismatch accumulation + refluxing.

Re-design of the reference's MappedLevelFluxRegister
(`/root/reference/src/MappedChombo/MappedLevelFluxRegister.H:21`:
setToZero :134, incrementCoarse :144, incrementFine :174, reflux :197;
used at AMRNavierStokesSync.cpp:88): conservation at the CF interface
requires the coarse divergence to use the time-and-space-averaged FINE
fluxes on interface faces rather than the coarse flux.

Dense single-patch version: the CF interface is the set of coarse faces
under the patch's interior boundary (per CF direction, two face planes at
traced positions).  The register holds, per CF direction, the coarse-face
plane deficit

    delta F = (1/nt) sum_substeps <F_fine> - F_coarse

and reflux() corrects the coarse cells adjacent to the interface:
    u_coarse -= dt/dx * (+/- delta F) / J.

The shipped lock-exchange configs run with refluxing off
(inputs.LockExchange_*: *_reflux = 0), matching the reference defaults;
enable via NSParams-style flags in AMRHierarchy(reflux=...).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from somar_tpu.amr.transfer import extract_patch
from somar_tpu.core.grid import Grid


class PatchFluxRegister:
    """Per-field flux register for one CF direction pair of the patch.

    Accepts either a 2-level AMRHierarchy (its backward-compatible
    aliases) or one PatchCoupling of an N-level hierarchy: both expose
    cf_dirs / interior_nx / ratio / ext_grid / halo and a parent grid."""

    def __init__(self, hierarchy_or_coupling):
        self.h = hierarchy_or_coupling
        self.grid0: Grid = getattr(hierarchy_or_coupling, "parent_grid",
                                   None) or hierarchy_or_coupling.grid0

    def zeros(self):
        """Initial register state: per CF dir, (lo_plane, hi_plane) coarse
        face-plane deficits (reference: setToZero)."""
        out = {}
        for d in self.h.cf_dirs:
            plane_shape = self._coarse_plane_shape(d)
            out[d] = (jnp.zeros(plane_shape), jnp.zeros(plane_shape))
        return out

    def _coarse_plane_shape(self, d: int):
        """Shape of one coarse face plane spanning the patch footprint in
        the tangential dirs."""
        shape = []
        for ax in range(self.grid0.ndim):
            dd = self.grid0.dir_of_axis(ax)
            if dd == d:
                continue
            shape.append(self.h.interior_nx[dd] // self.h.ratio[dd])
        return tuple(shape)

    def _fine_boundary_flux(self, flux_d, d: int, side: int):
        """Average the fine flux on the patch-interior boundary plane of
        dir d onto coarse faces (tangential block mean)."""
        grid0 = self.grid0
        h = self.h
        ax = h.ext_grid.axis(d)
        H = h.halo
        idx = H if side == 0 else flux_d.shape[ax] - H - 1
        plane = jax.lax.index_in_dim(flux_d, idx, axis=ax, keepdims=False)
        # crop tangential halos and block-average by the tangential ratios
        out = plane
        # figure out remaining axes' logical dirs in order
        rem_axes = [axx for axx in range(grid0.ndim) if axx != ax]
        for pos, axx in enumerate(rem_axes):
            dd = grid0.dir_of_axis(axx)
            if dd in h.cf_dirs:
                out = jax.lax.slice_in_dim(out, H, out.shape[pos] - H,
                                           axis=pos)
        # tangential block mean onto coarse faces
        shp = list(out.shape)
        resh = []
        mean_axes = []
        for pos, axx in enumerate(rem_axes):
            dd = grid0.dir_of_axis(axx)
            r = h.ratio[dd]
            resh.extend([shp[pos] // r, r])
            mean_axes.append(len(resh) - 1)
        return out.reshape(resh).mean(axis=tuple(mean_axes))

    def increment_fine(self, reg, fine_fluxes: Sequence, weight: float):
        """Accumulate the fine boundary fluxes (reference: incrementFine).
        weight = dt_f/dt_c = 1/nt so substeps time-average."""
        out = dict(reg)
        for d in self.h.cf_dirs:
            lo = self._fine_boundary_flux(fine_fluxes[d], d, 0)
            hi = self._fine_boundary_flux(fine_fluxes[d], d, 1)
            rlo, rhi = out[d]
            out[d] = (rlo + weight * lo, rhi + weight * hi)
        return out

    def increment_coarse(self, reg, coarse_fluxes: Sequence, origin_f):
        """Subtract the coarse interface fluxes (reference:
        incrementCoarse)."""
        grid0 = self.grid0
        h = self.h
        out = dict(reg)
        for d in self.h.cf_dirs:
            ax = grid0.axis(d)
            r = h.ratio[d]
            lo_face = (origin_f[ax] + h.halo) // r
            hi_face = lo_face + h.interior_nx[d] // r
            flux = coarse_fluxes[d]
            start = []
            shape = []
            for axx in range(grid0.ndim):
                dd = grid0.dir_of_axis(axx)
                if axx == ax:
                    continue
                start.append((origin_f[axx]
                              + (h.halo if dd in h.cf_dirs else 0))
                             // h.ratio[dd])
                shape.append(h.interior_nx[dd] // h.ratio[dd])

            def plane(face_idx):
                full_start = []
                full_shape = []
                k = 0
                for axx in range(grid0.ndim):
                    if axx == ax:
                        full_start.append(face_idx)
                        full_shape.append(1)
                    else:
                        full_start.append(start[k])
                        full_shape.append(shape[k])
                        k += 1
                p = jax.lax.dynamic_slice(flux, tuple(full_start),
                                          tuple(full_shape))
                return jnp.squeeze(p, axis=ax)

            rlo, rhi = out[d]
            out[d] = (rlo - plane(lo_face), rhi - plane(hi_face))
        return out

    def reflux(self, coarse_cc, reg, origin_f, dt, geo0=None):
        """Apply the deficit to the coarse cells adjacent to the interface
        (reference: reflux, divides by J): the lo-side interface face is
        the HIGH face of the coarse cell just outside the patch, so the
        correction enters with opposite signs on the two sides."""
        grid0 = self.grid0
        h = self.h
        out = coarse_cc
        Jinv = None
        if geo0 is not None and hasattr(geo0.Jinv, "ndim") \
                and geo0.Jinv.ndim == grid0.ndim:
            Jinv = geo0.Jinv
        for d in self.h.cf_dirs:
            ax = grid0.axis(d)
            r = h.ratio[d]
            dx = grid0.dx[d]
            lo_face = (origin_f[ax] + h.halo) // r
            hi_face = lo_face + h.interior_nx[d] // r
            rlo, rhi = reg[d]

            def add_at(arr, cell_idx, plane, sign):
                start = []
                k = 0
                for axx in range(grid0.ndim):
                    dd = grid0.dir_of_axis(axx)
                    if axx == ax:
                        start.append(cell_idx)
                    else:
                        start.append((origin_f[axx] + (h.halo if dd in
                                                       h.cf_dirs else 0))
                                     // h.ratio[dd])
                        k += 1
                shape = [1 if axx == ax else plane.shape[
                    sum(1 for a2 in range(axx) if a2 != ax)]
                    for axx in range(grid0.ndim)]
                cur = jax.lax.dynamic_slice(arr, tuple(start), tuple(shape))
                corr = sign * (dt / dx) * jnp.expand_dims(plane, ax)
                if Jinv is not None:
                    corr = corr * jax.lax.dynamic_slice(
                        Jinv, tuple(start), tuple(shape))
                upd = cur + corr
                return jax.lax.dynamic_update_slice(arr, upd, tuple(start))

            # lo interface: coarse cell just OUTSIDE (index lo_face-1) sees
            # the interface as its hi face: du = -dt/dx * deltaF
            out = add_at(out, lo_face - 1, rlo, -1.0)
            # hi interface: outside cell at hi_face sees it as its lo face
            out = add_at(out, hi_face, rhi, +1.0)
        return out
