"""MG transfer operators as strided convolutions (TPU-first).

The reshape-split forms (`restrict_fullweight` / `prolong_linear_mg` in
solvers/multigrid.py) split the minor (lane) and sublane axes, which XLA
materializes as whole-array relayouts — measured ~6.5 ms per
restrict+prolong round trip at 512x128x128 on v5e, dominating the
V-cycle.  Strided / input-dilated convolutions express the same linear
operators natively: XLA lowers them onto the TPU conv units with no
layout changes.  Reference operators being reimplemented:
FullWeightingPS (restriction) and the correction prolongation
(ProlongationStrategy.H:52) of
/root/reference/src/calculus/AMRElliptic/MGStrategies/.

Equivalence with the reshape forms is asserted to roundoff in
tests/test_solvers.py (and the legacy forms remain for CPU/other
backends).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from somar_tpu.core.grid import Grid

_DN3 = ("NCDHW", "OIDHW", "NCDHW")
_DN2 = ("NCHW", "OIHW", "NCHW")
_DN1 = ("NCH", "OIH", "NCH")


def _axes_ratio(arr_ndim: int, grid_f: Grid, ratio: Sequence[int]):
    return [ratio[grid_f.dir_of_axis(ax)] for ax in range(arr_ndim)]


def restrict_conv(fine, grid_f: Grid, ratio: Sequence[int]):
    """Block-average restriction as ONE strided convolution."""
    rr = _axes_ratio(fine.ndim, grid_f, ratio)
    if all(r == 1 for r in rr):
        return fine
    nd = fine.ndim
    w = jnp.full(tuple(rr), 1.0 / float(np.prod(rr)), fine.dtype)
    dn = {3: _DN3, 2: _DN2, 1: _DN1}[nd]
    out = jax.lax.conv_general_dilated(
        fine[None, None], w[None, None], window_strides=tuple(rr),
        padding="VALID", dimension_numbers=dn)
    return out[0, 0]


def _ghost_pad(c, ax: int, periodic: bool):
    """One ghost cell per side along `ax`: wrap (periodic) or linear
    extrapolation 2*c0 - c1 (one-sided slope at walls, matching
    prolong_linear_mg's edge rows); replicate when the axis is too short
    for a slope (slope -> 0)."""
    n = c.shape[ax]
    tk = lambda a, b: jax.lax.slice_in_dim(c, a, b, axis=ax)
    if periodic:
        lo, hi = tk(n - 1, n), tk(0, 1)
    elif n < 2:
        lo = hi = tk(0, n)
    else:
        lo = 2.0 * tk(0, 1) - tk(1, 2)
        hi = 2.0 * tk(n - 1, n) - tk(n - 2, n - 1)
    return jnp.concatenate([lo, c, hi], axis=ax)


def _prolong_kernel(r: int, dtype):
    """Input-dilated conv taps for multilinear prolongation at ratio r.

    fine_{r j + k} = c_j + off_k * s_j,  off_k = (k+0.5)/r - 0.5,
    s_j = 0.5*(c_{j+1} - c_{j-1});  with lhs_dilation=r and padding
    (r-1, r-1) each phase k reads disjoint kernel positions:
      w[r-1-k] = -off_k/2,  w[2r-1-k] = 1,  w[3r-1-k] = +off_k/2.
    """
    w = np.zeros(3 * r, np.float64)
    for k in range(r):
        off = (k + 0.5) / r - 0.5
        w[r - 1 - k] = -0.5 * off
        w[2 * r - 1 - k] = 1.0
        w[3 * r - 1 - k] = 0.5 * off
    return jnp.asarray(w, dtype)


def prolong_linear_conv(coarse, grid_f: Grid, ratio: Sequence[int],
                        periodic: Sequence[bool]):
    """Piecewise-multilinear prolongation as per-axis input-dilated
    convolutions (exactly prolong_linear_mg's operator)."""
    rr = _axes_ratio(coarse.ndim, grid_f, ratio)
    nd = coarse.ndim
    dn = {3: _DN3, 2: _DN2, 1: _DN1}[nd]
    out = coarse
    for ax in range(nd):
        r = rr[ax]
        if r == 1:
            continue
        d = grid_f.dir_of_axis(ax)
        g = _ghost_pad(out, ax, bool(periodic[d]))
        w1 = _prolong_kernel(r, out.dtype)
        kshape = [1] * nd
        kshape[ax] = 3 * r
        w = w1.reshape(kshape)
        dil = [1] * nd
        dil[ax] = r
        pad = [(0, 0)] * nd
        pad[ax] = (r - 1, r - 1)
        out = jax.lax.conv_general_dilated(
            g[None, None], w[None, None], window_strides=(1,) * nd,
            padding=pad, lhs_dilation=tuple(dil),
            dimension_numbers=dn)[0, 0]
    return out
