"""Boundary conditions as functional ghost fills.

Re-designs the reference's BC framework (BCDescriptor / BCGhostClass /
BCMethodHolder object web, `/root/reference/src/calculus/BCInterface/`,
`BCDescriptor.H:50-61`) as data + pure functions: a `BC` is a (type, value,
order) triple per (direction, side); `fill_ghosts_cc` pads a cell-centered
array with `ngrow` ghost layers computed from the BC formulas.  XLA fuses
the pad+fill into whatever stencil consumes it, so ghosts are never
materialized in HBM on the hot path.

Ghost formulas for CC data (boundary face lies between ghost and interior):
  PERIODIC   wrap.
  DIRICHLET  value v held at the face: odd reflection g_k = 2 v - c_{k-1}.
  NEUMANN    coordinate derivative dphi/dxi = g at the face: even
             reflection plus linear ramp g_k = c_{k-1} -/+ (2k-1) h g.
  EXTRAP     polynomial extrapolation of order 0/1/2 from interior cells
             (reference: EllipticExtrapBCGhostClass, ExtrapolationUtils).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Sequence, Tuple

import jax.numpy as jnp

from somar_tpu.core.grid import Grid


class BCType(enum.IntEnum):
    PERIODIC = 0
    DIRICHLET = 1
    NEUMANN = 2
    EXTRAP = 3
    #: coarse-fine interface: ghost CELLS hold externally supplied data
    #: (interpolated from the coarser level; reference: the CF BCType in
    #: BCDescriptor.H:50-61 + MappedQuadCFInterp ghost fills).  The
    #: homogeneous version zeroes the ghosts (correction solves).
    CF = 4


@dataclasses.dataclass(frozen=True)
class BC:
    """value: Dirichlet face value or Neumann coordinate derivative — a
    scalar, an array profile, or a CALLABLE `t -> scalar/array` for
    time-dependent boundary data (reference: EllipticBCValueFunc receives
    position AND time, EllipticBCInterface.H:52-64).  Callable values must
    be bound with `bind_time`/`FieldBCs.at_time` before a ghost fill; time
    is a traced operand so a ramped inflow costs no retrace."""
    type: BCType
    value: object = 0.0
    order: int = 1      # extrapolation order (0, 1 or 2) for EXTRAP

    @property
    def time_dependent(self) -> bool:
        return callable(self.value)

    def bind_time(self, t) -> "BC":
        """Evaluate a callable value at (traced) time t."""
        if not callable(self.value):
            return self
        return dataclasses.replace(self, value=self.value(t))

    @staticmethod
    def periodic() -> "BC":
        return BC(BCType.PERIODIC)

    @staticmethod
    def dirichlet(value: float = 0.0) -> "BC":
        return BC(BCType.DIRICHLET, value=value)

    @staticmethod
    def neumann(value: float = 0.0) -> "BC":
        return BC(BCType.NEUMANN, value=value)

    @staticmethod
    def extrap(order: int = 1) -> "BC":
        return BC(BCType.EXTRAP, order=order)

    @staticmethod
    def cf(value=0.0) -> "BC":
        """Coarse-fine ghost cells; `value` may be an array block shaped
        like the ghost region (ngrow layers) or 0.0 for homogeneous."""
        return BC(BCType.CF, value=value)


@dataclasses.dataclass(frozen=True)
class FieldBCs:
    """Per-direction, per-side BCs for one field.

    lo[d] / hi[d] are the BCs on the low / high side of logical dir d.
    """

    lo: Tuple[BC, ...]
    hi: Tuple[BC, ...]

    def __post_init__(self):
        assert len(self.lo) == len(self.hi)

    @property
    def ndim(self) -> int:
        return len(self.lo)

    @staticmethod
    def uniform(bc: BC, ndim: int) -> "FieldBCs":
        return FieldBCs(lo=(bc,) * ndim, hi=(bc,) * ndim)

    @staticmethod
    def from_periodic(grid: Grid, interior: BC) -> "FieldBCs":
        """Periodic where the grid is periodic, `interior` elsewhere."""
        lo = tuple(BC.periodic() if p else interior for p in grid.periodic)
        return FieldBCs(lo=lo, hi=lo)

    def homogeneous(self) -> "FieldBCs":
        """Same types with zero values (for residual / correction solves)."""
        z = lambda b: dataclasses.replace(b, value=0.0)
        return FieldBCs(lo=tuple(z(b) for b in self.lo), hi=tuple(z(b) for b in self.hi))

    @property
    def time_dependent(self) -> bool:
        return any(b.time_dependent for b in self.lo + self.hi)

    def at_time(self, t) -> "FieldBCs":
        """Bind every callable BC value at (traced) time t; identity when
        nothing is time-dependent (keeps the no-op path hashable)."""
        if not self.time_dependent:
            return self
        return FieldBCs(lo=tuple(b.bind_time(t) for b in self.lo),
                        hi=tuple(b.bind_time(t) for b in self.hi))


def bind_bcs_time(bcs, t):
    """at_time over a FieldBCs or a (nested) tuple of them."""
    if isinstance(bcs, FieldBCs):
        return bcs.at_time(t)
    return tuple(bind_bcs_time(b, t) for b in bcs)


def _take(arr, ax: int, idx_from: int, idx_to: int):
    """Slice helper: arr[..., idx_from:idx_to, ...] along axis ax."""
    sl = [slice(None)] * arr.ndim
    sl[ax] = slice(idx_from, idx_to if idx_to != 0 else None)
    return arr[tuple(sl)]


def _ghost_block(arr, ax: int, bc: BC, ngrow: int, side: int, h: float):
    """Build the ngrow-layer ghost block along axis ax on the given side.

    side = -1 for the low side, +1 for the high side.  Returned block is
    ordered so it can be concatenated directly (outermost ghost first on the
    low side, innermost first on the high side).
    """
    n = arr.shape[ax]
    assert n >= ngrow, f"need >= {ngrow} interior cells along axis {ax}"
    assert not callable(bc.value), \
        "time-dependent BC value not bound: call FieldBCs.at_time(t) first"

    def interior(k):
        # k-th interior cell counted from the boundary (k = 1..ngrow)
        if side < 0:
            return _take(arr, ax, k - 1, k)
        return _take(arr, ax, n - k, n - k + 1)

    def fit_value(v):
        """Array-valued BC profiles (e.g. the HorizConv hot/cold top
        ramp) are built on the interior shape; ghost fills along EARLIER
        directions have already widened the tangential axes, so edge-pad
        the profile symmetrically to match."""
        if not hasattr(v, "shape") or getattr(v, "ndim", 0) == 0:
            return v
        v = jnp.asarray(v)
        ref = interior(1)
        pads = []
        for a in range(ref.ndim):
            if a == ax or v.shape[a] in (1, ref.shape[a]):
                pads.append((0, 0))
            else:
                extra = ref.shape[a] - v.shape[a]
                pads.append((extra // 2, extra - extra // 2))
        if any(p != (0, 0) for p in pads):
            v = jnp.pad(v, pads, mode="edge")
        return v

    layers = []  # innermost ghost (k=1) first
    if bc.type == BCType.DIRICHLET:
        val = fit_value(bc.value)
        for k in range(1, ngrow + 1):
            layers.append(2.0 * val - interior(k))
    elif bc.type == BCType.NEUMANN:
        s = -1.0 if side < 0 else 1.0
        val = fit_value(bc.value)
        for k in range(1, ngrow + 1):
            layers.append(interior(k) + s * (2 * k - 1) * h * val)
    elif bc.type == BCType.EXTRAP:
        if bc.order == 0:
            for k in range(1, ngrow + 1):
                layers.append(interior(1))
        elif bc.order == 1:
            c0, c1 = interior(1), interior(2)
            for k in range(1, ngrow + 1):
                layers.append((k + 1.0) * c0 - k * c1)
        elif bc.order == 2:
            c0, c1, c2 = interior(1), interior(2), interior(3)
            for k in range(1, ngrow + 1):
                # quadratic through the 3 edge cells, evaluated k cells out
                a = (k + 1.0) * (k + 2.0) / 2.0
                b = -k * (k + 2.0)
                c = k * (k + 1.0) / 2.0
                layers.append(a * c0 + b * c1 + c * c2)
        else:
            raise ValueError(f"unsupported extrap order {bc.order}")
    elif bc.type == BCType.CF:
        # externally supplied ghost data (or zeros when homogeneous);
        # a scalar value broadcasts, an array must already be the full
        # ngrow-deep ghost block in the correct orientation
        ref = interior(1)
        block_shape = list(ref.shape)
        block_shape[ax] = ngrow
        if hasattr(bc.value, "shape") and getattr(bc.value, "ndim", 0) > 0:
            return jnp.broadcast_to(bc.value, block_shape)
        return jnp.full(block_shape, bc.value, dtype=arr.dtype)
    else:
        raise ValueError(f"unsupported BC type {bc.type}")

    if side < 0:
        layers = layers[::-1]  # outermost first
    return jnp.concatenate(layers, axis=ax)


def fill_ghosts_cc(field, grid: Grid, bcs: FieldBCs, ngrow: int | Sequence[int] = 1):
    """Pad a CC field with ghost layers per the BCs.

    Axes are filled in logical-direction order x, y, z so that corner ghosts
    are consistent (each later axis's ghost formulas see the earlier axes'
    ghosts — the TPU analog of the reference's exchange + corner-Copier
    dance, AMRNavierStokesAdvancePPM.cpp:1452-1453).

    ngrow may be a scalar or a per-logical-direction sequence; 0 skips a
    direction.
    """
    ndim = grid.ndim
    if isinstance(ngrow, int):
        ngrow = (ngrow,) * ndim
    out = field
    for d in range(ndim):
        ng = ngrow[d]
        if ng == 0:
            continue
        ax = grid.axis(d)
        if bcs.lo[d].type == BCType.PERIODIC:
            assert bcs.hi[d].type == BCType.PERIODIC
            pad = [(0, 0)] * out.ndim
            pad[ax] = (ng, ng)
            out = jnp.pad(out, pad, mode="wrap")
        else:
            lo = _ghost_block(out, ax, bcs.lo[d], ng, -1, grid.dx[d])
            hi = _ghost_block(out, ax, bcs.hi[d], ng, +1, grid.dx[d])
            out = jnp.concatenate([lo, out, hi], axis=ax)
    return out


def apply_fc_bc(flux, d: int, grid: Grid, bcs: FieldBCs):
    """Overwrite the boundary faces of a FC (normal-component) field.

    Only DIRICHLET BCs pin the boundary face value (e.g. zero normal flow
    through solid walls); other types leave the face untouched (outflow /
    periodic faces already hold valid data).
    """
    ax = grid.axis(d)
    n = flux.shape[ax]
    if bcs.lo[d].type == BCType.DIRICHLET:
        flux = _set_slice(flux, ax, 0, bcs.lo[d].value)
    if bcs.hi[d].type == BCType.DIRICHLET:
        flux = _set_slice(flux, ax, n - 1, bcs.hi[d].value)
    return flux


def _set_slice(arr, ax: int, idx: int, value):
    sl = [slice(None)] * arr.ndim
    sl[ax] = idx
    return arr.at[tuple(sl)].set(value)
