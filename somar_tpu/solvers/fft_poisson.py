"""Direct Poisson/Helmholtz solver by fast diagonalization — the
uniform-grid fast path, implemented as MXU matmuls.

The reference has no analog: its MG machinery exists because mapped
metrics and AMR break constant coefficients.  On uniform Cartesian
configurations (TaylorGreen, the Cartesian LockExchange benchmarks —
exec/inputs.*Cartesian*) the discrete operator is diagonal in a
separable eigenbasis:

  * periodic axis      -> real Fourier modes, lam = (2 cos(2 pi m/n)-2)/dx^2
  * hom-Neumann axis   -> DCT-II modes,       lam = (2 cos(pi k/n) -2)/dx^2
  * hom-Dirichlet axis -> DST-II modes,       lam = (2 cos(pi(k+1)/n)-2)/dx^2

because mirror / anti-mirror / wraparound ghosts make the 3-point stencil
act on each mode independently.  One forward + one inverse transform per
axis solves alpha*u + beta*L u = f exactly — replacing ~10 multigrid
V-cycles per projection.

TPU design: each per-axis transform is a dense n x n ORTHOGONAL matrix
multiply (precomputed in float64, applied in f32) — this runs on the MXU
at matmul speed, which profiles ~50x faster here than routing through
complex FFTs (XLA's TPU FFT lowering is not bandwidth-optimal for these
mixed DCT/FFT pipelines, and n <= O(1000) makes the O(n) matmul factor
cheap).  The transforms are orthonormal, so inverses are transposes.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from somar_tpu.core.bc import BCType, FieldBCs
from somar_tpu.geometry.level_geometry import LevelGeometry


def mxu_precision():
    """Matmul precision for the spectral transforms.  The MXU's default
    bf16 truncation (~2e-3 relative) leaves the 'exact' projection
    ~1e-3 non-solenoidal and accumulates as secular drift in AMR runs;
    HIGHEST (f32 emulation) restores 1e-7.  SOMAR_MXU_PRECISION=high
    selects the 3-pass variant (~1e-5) where the extra margin is not
    needed."""
    import os
    import jax
    return {"high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}.get(
        os.environ.get("SOMAR_MXU_PRECISION", "highest"),
        jax.lax.Precision.HIGHEST)


def _dct2_matrix(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Orthonormal DCT-II rows + mode indices k (hom-Neumann modes)."""
    j = np.arange(n)
    k = np.arange(n)[:, None]
    Q = np.cos(np.pi * k * (2 * j + 1) / (2 * n))
    s = np.full(n, np.sqrt(2.0 / n))
    s[0] = np.sqrt(1.0 / n)
    return s[:, None] * Q, np.arange(n)


def _dst2_matrix(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Orthonormal DST-II rows (hom-Dirichlet modes)."""
    j = np.arange(n)
    k = np.arange(n)[:, None]
    Q = np.sin(np.pi * (k + 1) * (2 * j + 1) / (2 * n))
    t = np.full(n, np.sqrt(2.0 / n))
    t[n - 1] = np.sqrt(1.0 / n)
    return t[:, None] * Q, np.arange(n) + 1


def _axis_eigenbasis(n: int, lo_type: BCType,
                     hi_type: BCType) -> Tuple[np.ndarray, np.ndarray]:
    """Numerically diagonalize the 1D 3-point operator for any mix of
    non-periodic homogeneous end conditions.  Ghost formulas per end:
    NEUMANN mirror (g = c0), DIRICHLET anti-mirror (g = -c0), CF ghost
    cells hold external data -> 0 in the homogeneous operator (the AMR
    patch case; inhomogeneous CF data is folded into the RHS by the ring
    machinery, projector._rhs_ring_correction).  The matrix is symmetric
    tridiagonal, so eigh returns an orthonormal eigenbasis; for same-type
    ends this reproduces the DCT-II / DST-II / DST-I families."""
    A = np.diag(np.full(n, -2.0)) + np.diag(np.ones(n - 1), 1) \
        + np.diag(np.ones(n - 1), -1)
    end = {BCType.NEUMANN: -1.0, BCType.DIRICHLET: -3.0, BCType.CF: -2.0}
    A[0, 0] = end[lo_type]
    A[n - 1, n - 1] = end[hi_type]
    lam, V = np.linalg.eigh(A)
    return V.T, lam   # rows = eigenvectors; lam in units of 1/dx^2-free


def _fourier_matrix(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real orthonormal Fourier rows + per-row wavenumber m (periodic)."""
    j = np.arange(n)
    rows = [np.full(n, 1.0 / np.sqrt(n))]
    ms = [0]
    for m in range(1, (n + 1) // 2):
        rows.append(np.sqrt(2.0 / n) * np.cos(2 * np.pi * m * j / n))
        ms.append(m)
        rows.append(np.sqrt(2.0 / n) * np.sin(2 * np.pi * m * j / n))
        ms.append(m)
    if n % 2 == 0:
        rows.append(((-1.0) ** j) / np.sqrt(n))
        ms.append(n // 2)
    return np.stack(rows), np.asarray(ms)


class FFTPoissonSolver:
    """Fast-diagonalization direct solver on uniform grids (J=1, g=I)."""

    def __init__(self, geo: LevelGeometry, bcs: FieldBCs, dtype=jnp.float32):
        grid = geo.grid
        assert geo.is_uniform, "spectral path requires a uniform map"
        self.grid = grid
        self.dtype = dtype
        self.Q: List = []        # per array axis: (axis, Q matrix)
        self.lam_axes: List = []  # per array axis: broadcastable 1D lam
        for d in range(grid.ndim):
            ax = grid.axis(d)
            n = grid.nx[d]
            dx = grid.dx[d]
            blo, bhi = bcs.lo[d], bcs.hi[d]
            if blo.type == BCType.PERIODIC:
                Qm, modes = _fourier_matrix(n)
                lam = (2.0 * np.cos(2.0 * np.pi * modes / n) - 2.0) / dx**2
            elif blo.type == BCType.NEUMANN and bhi.type == BCType.NEUMANN:
                Qm, modes = _dct2_matrix(n)
                lam = (2.0 * np.cos(np.pi * modes / n) - 2.0) / dx**2
            elif blo.type == BCType.DIRICHLET \
                    and bhi.type == BCType.DIRICHLET:
                Qm, modes = _dst2_matrix(n)
                lam = (2.0 * np.cos(np.pi * modes / n) - 2.0) / dx**2
            else:
                # mixed ends and/or CF ghost-zero (AMR patch levels)
                Qm, lam = _axis_eigenbasis(n, blo.type, bhi.type)
                lam = lam / dx**2
            # orthonormality sanity (float64 build)
            err = np.abs(Qm @ Qm.T - np.eye(n)).max()
            assert err < 1e-10, f"transform not orthonormal: {err}"
            self.Q.append((ax, jnp.asarray(Qm, dtype)))
            shape = [1] * grid.ndim
            shape[ax] = n
            self.lam_axes.append(
                jnp.asarray(lam.reshape(shape).astype(np.float32)))
        # the constant mode exists only when every axis is pure
        # Neumann/periodic; any Dirichlet or CF end pins the solution
        # (lam is exposed as a lazy broadcast-sum property: a materialized
        # full-shape eigenvalue array costs a 33 MB HBM read per use at
        # the 512 bench — the broadcasts fuse in-register instead)
        self.singular = all(
            bcs.lo[d].type in (BCType.PERIODIC, BCType.NEUMANN)
            and bcs.hi[d].type in (BCType.PERIODIC, BCType.NEUMANN)
            for d in range(grid.ndim))

    @property
    def lam(self):
        """Total eigenvalue field as a lazy broadcast sum (full shape)."""
        out = self.lam_axes[0]
        for l in self.lam_axes[1:]:
            out = out + l
        return out

    @staticmethod
    def supports(geo: LevelGeometry, bcs: FieldBCs) -> bool:
        if not geo.is_uniform:
            return False

        def hom_end(b):
            return (b.type in (BCType.NEUMANN, BCType.DIRICHLET, BCType.CF)
                    and np.ndim(b.value) == 0 and float(b.value) == 0.0)

        for d in range(geo.grid.ndim):
            lo, hi = bcs.lo[d], bcs.hi[d]
            ok = (lo.type == BCType.PERIODIC
                  and hi.type == BCType.PERIODIC) \
                or (hom_end(lo) and hom_end(hi))
            if not ok:
                return False
        return True

    def fwd(self, x):
        """Forward transform to the eigenbasis (public for callers that
        combine several diagonal operations per round-trip, e.g. the
        parabolic schemes' fused updates)."""
        return self._apply(x.astype(self.dtype), transpose=False)

    def inv(self, x):
        """Inverse (transpose) transform from the eigenbasis."""
        return self._apply(x, transpose=True).astype(self.dtype)

    def _apply(self, x, transpose: bool):
        """Multiply every axis by its transform matrix (MXU einsums).

        The einsum keeps the transformed mode in place (no moveaxis):
        explicit transposes between the per-axis matmuls block XLA from
        fusing across the forward/scale/inverse chain — measured 4.5 ->
        2.7 ms per 512x128x128 solve on v5e when the transposes go.

        precision=HIGHEST is REQUIRED: the TPU MXU's default matmul
        truncates inputs to bf16 (~2e-3 relative error), which leaves the
        'exact' projection ~1e-3 non-solenoidal and accumulates as a
        secular drift in long AMR runs (measured: coarse-level scalar
        overshoot growing ~1.5% per 6 steps).  HIGHEST runs the f32
        emulation passes and restores 1e-7 transform accuracy."""
        letters = "abcdefgh"[:x.ndim]
        for ax, Qm in self.Q:
            M = Qm.T if transpose else Qm
            sub = (f"K{letters[ax]},{letters}->"
                   f"{letters[:ax]}K{letters[ax + 1:]}")
            x = jnp.einsum(sub, M, x, precision=mxu_precision())
        return x

    def solve(self, rhs, alpha=0.0, beta=1.0):
        """Exact solve; the zero (constant) mode is nulled when singular
        (alpha == 0 with a null space)."""
        X = self._apply(rhs.astype(self.dtype), transpose=False)
        denom = alpha + beta * self.lam
        safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
        X = jnp.where(jnp.abs(denom) > 1e-12, X / safe, 0.0)
        return self._apply(X, transpose=True).astype(self.dtype)
