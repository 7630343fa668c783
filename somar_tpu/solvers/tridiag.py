"""Batched tridiagonal solvers along the vertical axis.

Re-design of the reference's Thomas/tridiagonal machinery
(`/root/reference/src/utils/ThomasAlgorithm.f90:26-35`,
`TridiagUtilsF.ChF` TriDiagPoissonNN1D) for TPU: the reference solves one
line at a time inside Fortran loops; here a single `lax.scan` over the
vertical axis (array axis 0) solves **every** column of the level at once —
the horizontal plane (ny*nx, lane-aligned) is fully vectorized, which is
how vertical-line work maps onto the VPU.

Also provides the Neumann-Neumann vertical Poisson line solve used by the
leptic solver (singular system: solvable iff the RHS integrates to zero
along each line; we pin the mean like the reference's NN solver).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def thomas_solve(a, b, c, d):
    """Solve tridiagonal systems along axis 0 (vectorized over other axes).

    a: sub-diagonal   (n, ...) with a[0] ignored
    b: diagonal       (n, ...)
    c: super-diagonal (n, ...) with c[n-1] ignored
    d: right-hand side (n, ...)
    Returns x with the same shape as d.
    """
    n = d.shape[0]

    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        ai, bi, ci, di = inp
        denom = bi - ai * cp_prev
        cp = ci / denom
        dp = (di - ai * dp_prev) / denom
        return (cp, dp), (cp, dp)

    zeros = jnp.zeros_like(d[0])
    (_, _), (cps, dps) = jax.lax.scan(fwd, (zeros, zeros), (a, b, c, d))

    def bwd(x_next, inp):
        cp, dp = inp
        x = dp - cp * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, zeros, (cps, dps), reverse=True)
    return xs


def vertical_poisson_nn(rhs, acoef_lo, acoef_hi, dz):
    """Neumann-Neumann vertical Poisson line solves (leptic substrate).

    Solves (1/dz) * [ A_hi (x_{k+1}-x_k)/dz - A_lo (x_k - x_{k-1})/dz ] = rhs
    along axis 0 with homogeneous Neumann at both ends, where A_lo/A_hi are
    the face coefficients (vertical Jgup) below/above each cell.  The system
    is singular; we solve the compatible part by pinning the column mean to
    zero (reference: TriDiagPoissonNN1DFAB pins a reference value).

    rhs must have zero vertical mean per column for an exact solve; any
    incompatible part is removed (it is the leptic "excess").
    """
    n = rhs.shape[0]
    # remove incompatible (mean) part
    rhs = rhs - jnp.mean(rhs, axis=0, keepdims=True)

    inv_dz2 = 1.0 / (dz * dz)
    a = acoef_lo * inv_dz2              # coupling to k-1
    c = acoef_hi * inv_dz2              # coupling to k+1
    # homogeneous Neumann: zero-flux faces at the ends
    a = a.at[0].set(0.0)
    c = c.at[n - 1].set(0.0)
    b = -(a + c)

    # regularize the singular mode: replace the last equation by x mean = 0
    # via a rank-one trick — solve with b shifted on one row, then subtract
    # the mean afterwards.  Simpler robust approach: pin x[0] = 0.
    b = b.at[0].add(-inv_dz2 * 0.0)  # no-op, kept for clarity
    # Pin x[0]: first row -> identity
    a0 = a.at[0].set(0.0)
    c0 = c.at[0].set(0.0)
    b0 = b.at[0].set(1.0)
    d0 = rhs.at[0].set(0.0)
    x = thomas_solve(a0, b0, c0, d0)
    # return zero-mean solution (the natural gauge)
    return x - jnp.mean(x, axis=0, keepdims=True)
