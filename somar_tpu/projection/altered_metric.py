"""AlteredMetric: the implicit-gravity modification of the Poisson metric.

Re-design of the reference's AlteredMetric
(`/root/reference/src/projection/AlteredMetric.H:34-56`, fill_Jgup:
AlteredMetric.cpp:78):

    Jgup'^{ij} = J * (g^{ij} - (w^2 / (1 + w^2)) dxi^i/dz dxi^j/dz),
    w = dt * theta * N(z)

Making gravity implicit inside the pressure projection costs no extra
Poisson solves — the metric of the single projection changes instead
(the "BV solver", reference README.md:20-21).

TPU design: dt is traced, so the altered metric cannot be baked into the
operator.  We precompute the static per-MG-level fields
P^{ij} = J * (dxi^i/dz)(dxi^j/dz) and N^2 at faces once, and produce the
additive `jgup_delta` = -fac * P with fac = w^2/(1+w^2) per call — a pair
of cheap elementwise ops fused into the smoother.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np


class AlteredMetric:
    """Static altered-metric fields for every level of one MG hierarchy."""

    def __init__(self, mg, background, dtype=jnp.float32):
        """mg: a LevelMultigrid (its ops define the level geometries);
        background: a BackgroundProfile supplying N^2(z)."""
        self.mg = mg
        self.background = background
        self.levels = []
        for op in mg.ops:
            self.levels.append(self._build_level(op.geo, dtype))
        # fine-level CC N^2, precomputed host-side (static data; computing
        # it inside the jitted step would lift it into the trace)
        geo0 = mg.ops[0].geo
        grid0 = geo0.grid
        z = np.broadcast_to(geo0.phys_coords_cc()[grid0.vertical_dir],
                            grid0.shape)
        self._nsq_cc_fine = jnp.asarray(
            np.maximum(np.asarray(background.nsq(jnp.asarray(z))), 0.0),
            dtype)

    def _build_level(self, geo, dtype):
        grid = geo.grid
        ndim = grid.ndim
        vert = grid.vertical_dir
        P_diag, nsq_fc, P_rows = [], [], []
        diagonal_only = geo.is_uniform or geo.is_diagonal
        for d in range(ndim):
            cent = [0] * ndim
            cent[d] = 1
            xi = grid.coords(cent)
            fshape = grid.fc_shape(d)
            # physical z and dxi^i/dz at the d-faces
            if geo.is_uniform:
                zf = np.broadcast_to(xi[vert], fshape)
                dxidz = np.zeros((ndim,) + fshape)
                dxidz[vert] = 1.0
                J = np.ones(fshape)
            else:
                J, gup, gdn, e, einv = geo.geo.metrics(xi)
                J = np.broadcast_to(J, fshape)
                zf = np.broadcast_to(geo.geo.phys_coor(vert, xi), fshape)
                dxidz = np.stack([np.broadcast_to(einv[i, vert], fshape)
                                  for i in range(ndim)])
            nsq = np.maximum(np.asarray(self.background.nsq(jnp.asarray(zf))),
                             0.0)
            nsq_fc.append(jnp.asarray(nsq, dtype))
            P_diag.append(jnp.asarray(J * dxidz[d] ** 2, dtype))
            if not diagonal_only:
                P_rows.append(jnp.asarray(
                    np.stack([J * dxidz[d] * dxidz[j] for j in range(ndim)]),
                    dtype))
        return {
            "P_diag": tuple(P_diag),
            "nsq_fc": tuple(nsq_fc),
            "P_rows": tuple(P_rows) if P_rows else None,
        }

    def jgup_delta_list(self, dt_theta) -> List:
        """Per-MG-level (delta_diag, delta_full) for a traced dt*theta."""
        out = []
        dt2 = dt_theta * dt_theta
        for lev in self.levels:
            diag, full = [], []
            for d in range(len(lev["P_diag"])):
                nsq = lev["nsq_fc"][d]
                fac = dt2 * nsq / (1.0 + dt2 * nsq)
                diag.append(-fac * lev["P_diag"][d])
                if lev["P_rows"] is not None:
                    full.append(-fac * lev["P_rows"][d])
            out.append((tuple(diag), tuple(full) if full else None))
        return out

    def nsq_cc(self, geo, dtype=jnp.float32):
        """N^2 at cell centers of the fine level (for the velocity/buoyancy
        updates; reference: FORT_COMPUTENSQANDDINV).  Precomputed."""
        return self._nsq_cc_fine
