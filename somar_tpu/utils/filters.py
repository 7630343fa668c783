"""Shapiro filters: high-wavenumber smoothing.

Re-design of the reference's ShapiroFilter
(`/root/reference/src/utils/ShapiroFilter.H:44,66`): the classic 1D
2nd-order Shapiro filter  f_i <- f_i + (s/4)(f_{i-1} - 2 f_i + f_{i+1})
applied per direction (s = 1 gives the full 1-2-1 filter killing the
Nyquist mode exactly), and its multi-dimensional sequential composition.
Present-but-unwired in the reference's main path; exposed here for
post-regrid smoothing and diagnostics.
"""

from __future__ import annotations

from somar_tpu.core.bc import FieldBCs, fill_ghosts_cc
from somar_tpu.core.grid import Grid
from somar_tpu.ops.stencil import slc


def shapiro_filter_1d(field, grid: Grid, bcs: FieldBCs, d: int,
                      strength: float = 1.0, passes: int = 1):
    """2nd-order Shapiro filter along logical direction d."""
    ax = grid.axis(d)
    out = field
    for _ in range(passes):
        ng = [0] * grid.ndim
        ng[d] = 1
        p = fill_ghosts_cc(out, grid, bcs, ng)
        lap = slc(p, ax, 0, -2) - 2.0 * slc(p, ax, 1, -1) + slc(p, ax, 2, None)
        out = out + 0.25 * strength * lap
    return out


def shapiro_filter(field, grid: Grid, bcs: FieldBCs,
                   strength: float = 1.0, passes: int = 1):
    """Sequential per-direction Shapiro filtering (reference: the 2D/3D
    composition in ShapiroFilter.cpp)."""
    out = field
    for _ in range(passes):
        for d in range(grid.ndim):
            out = shapiro_filter_1d(out, grid, bcs, d, strength, 1)
    return out
