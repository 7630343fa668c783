"""Interpolation utilities.

Re-design of the reference's interpolation layer
(`/root/reference/src/calculus/interpolation/`): BilinearInterp
(BilinearInterp2DF), HermiteInterp (HermiteInterp2DF), ConvertFAB's
4th-order cell->face (CellToEdge4th), LinearNodeInterp.  CubicSpline is
served by scipy host-side (geometry/bathymetric.py).  These are sampling
utilities (probes, IC evaluation, plot resampling) — the AMR transfer
operators live in amr/transfer.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from somar_tpu.core.bc import FieldBCs, fill_ghosts_cc
from somar_tpu.core.grid import Grid
from somar_tpu.ops.stencil import slc


def cc_to_fc_4th(field, d: int, grid: Grid, bcs: FieldBCs):
    """4th-order cell->face interpolation (reference: CellToEdge4th):
    f_{i+1/2} = (7/12)(f_i + f_{i+1}) - (1/12)(f_{i-1} + f_{i+2})."""
    ax = grid.axis(d)
    ng = [0] * grid.ndim
    ng[d] = 2
    p = fill_ghosts_cc(field, grid, bcs, ng)
    n = p.shape[ax]
    return ((7.0 / 12.0) * (slc(p, ax, 1, n - 2) + slc(p, ax, 2, n - 1))
            - (1.0 / 12.0) * (slc(p, ax, 0, n - 3) + slc(p, ax, 3, n)))


def bilinear_sample(field, grid: Grid, points):
    """Sample a CC field at mapped-space points by multilinear
    interpolation (reference: BilinearInterp2DF).

    points: (npts, ndim) mapped coordinates in LOGICAL dir order.
    """
    pts = jnp.asarray(points)
    idx = []
    frac = []
    for d in range(grid.ndim):
        ax = grid.axis(d)
        t = (pts[:, d] - grid.x0[d]) / grid.dx[d] - 0.5
        t = jnp.clip(t, 0.0, grid.nx[d] - 1.0 - 1e-6)
        i0 = jnp.floor(t).astype(jnp.int32)
        idx.append((ax, i0))
        frac.append(t - i0)

    out = 0.0
    ndim = grid.ndim
    for corner in range(2 ** ndim):
        w = 1.0
        gather_idx = [None] * ndim
        for d in range(ndim):
            ax, i0 = idx[d]
            bit = (corner >> d) & 1
            w = w * (frac[d] if bit else (1.0 - frac[d]))
            gather_idx[ax] = i0 + bit
        out = out + w * field[tuple(gather_idx)]
    return out


def hermite_sample_1d(f, dfdx, x0: float, dx: float, xq):
    """Cubic Hermite interpolation along a 1D profile given values and
    derivatives at cell centers (reference: HermiteInterp2DF)."""
    t = (jnp.asarray(xq) - x0) / dx - 0.5
    t = jnp.clip(t, 0.0, f.shape[0] - 1.0 - 1e-6)
    i0 = jnp.floor(t).astype(jnp.int32)
    s = t - i0
    f0, f1 = f[i0], f[i0 + 1]
    m0, m1 = dfdx[i0] * dx, dfdx[i0 + 1] * dx
    h00 = 2 * s**3 - 3 * s**2 + 1
    h10 = s**3 - 2 * s**2 + s
    h01 = -2 * s**3 + 3 * s**2
    h11 = s**3 - s**2
    return h00 * f0 + h10 * m0 + h01 * f1 + h11 * m1


def node_interp_linear(cc_field, grid: Grid, bcs: FieldBCs):
    """CC -> node (corner) multilinear averaging (reference:
    LinearNodeInterp) — plotting / streamfunction utilities."""
    p = fill_ghosts_cc(cc_field, grid, bcs, 1)
    out = p
    for ax in range(grid.ndim):
        n = out.shape[ax]
        out = 0.5 * (slc(out, ax, 0, n - 1) + slc(out, ax, 1, n))
    return out
