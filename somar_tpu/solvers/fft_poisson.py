"""Spectral (FFT/DCT/DST) direct Poisson/Helmholtz solver — uniform-grid
fast path.

The reference has no analog: its MG machinery exists because mapped
metrics and AMR break constant coefficients.  On TPU the uniform Cartesian
configurations (TaylorGreen, the Cartesian LockExchange benchmarks —
exec/inputs.*Cartesian*) admit an EXACT eigendecomposition of the
discrete operator:

  * periodic axis      -> FFT,    eigenvalues (2 cos(2 pi k / n) - 2)/dx^2
  * hom-Neumann axis   -> DCT-II, eigenvalues (2 cos(pi k / n)  - 2)/dx^2
  * hom-Dirichlet axis -> DST-II, eigenvalues (-2 - 2 cos(pi (k+1)/n))/dx^2

because the 3-point stencil with mirror (Neumann), anti-mirror
(Dirichlet) or wraparound (periodic) ghosts is diagonal in these bases.
One forward + one inverse transform solves alpha*u + beta*L u = f to
machine precision — replacing ~10 multigrid V-cycles per projection.
XLA's TPU FFT keeps this bandwidth-bound.

The projector auto-selects this path when the geometry is uniform and
every BC qualifies; anything else falls back to multigrid.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from somar_tpu.core.bc import BCType, FieldBCs
from somar_tpu.core.grid import Grid
from somar_tpu.geometry.level_geometry import LevelGeometry


def _dct2(x, axis):
    """DCT-II along axis via FFT of the even extension (jax.scipy.fft.dct
    exists but routing through one complex FFT keeps TPU lowering simple
    and batched)."""
    n = x.shape[axis]
    ext = jnp.concatenate([x, jnp.flip(x, axis=axis)], axis=axis)
    X = jnp.fft.fft(ext, axis=axis)
    k = jnp.arange(n)
    shape = [1] * x.ndim
    shape[axis] = n
    w = jnp.exp(-1j * np.pi * k / (2 * n)).reshape(shape)
    # keep complex: other axes may carry FFT spectra (linear in the input,
    # so the complex "DCT" composes correctly; real is taken at the end)
    return (X.take(indices=jnp.arange(n), axis=axis)) * w


def _idct2(X, axis):
    """Inverse of _dct2 (orthogonality up to the standard 1/(2n) scale)."""
    n = X.shape[axis]
    k = jnp.arange(n)
    shape = [1] * X.ndim
    shape[axis] = n
    w = jnp.exp(1j * np.pi * k / (2 * n)).reshape(shape)
    V = X * w
    # rebuild the length-2n spectrum of the even extension and invert
    zero = jnp.zeros_like(jnp.take(V, jnp.asarray([0]), axis=axis))
    Vfull = jnp.concatenate(
        [V, zero, jnp.conj(jnp.flip(jnp.take(V, jnp.arange(1, n), axis=axis),
                                    axis=axis))], axis=axis)
    x = jnp.fft.ifft(Vfull, axis=axis)
    # exact inverse of _dct2 (pair verified in tests); complex-safe
    return jnp.take(x, jnp.arange(n), axis=axis)


def _dst2(x, axis):
    """DST-II along axis via FFT of the odd extension; linear (no conj),
    so complex mid-pipeline data passes through."""
    n = x.shape[axis]
    ext = jnp.concatenate([x, -jnp.flip(x, axis=axis)], axis=axis)
    X = jnp.fft.fft(ext, axis=axis)
    k = jnp.arange(n)
    shape = [1] * x.ndim
    shape[axis] = n
    w = jnp.exp(-1j * np.pi * (k + 1) / (2 * n)).reshape(shape)
    return 1j * w * X.take(indices=jnp.arange(1, n + 1), axis=axis)


def _idst2_real(S, axis):
    """Inverse DST-II for REAL input (uses conj symmetry; the caller
    splits complex data into real/imag parts)."""
    n = S.shape[axis]
    k = jnp.arange(n)
    shape = [1] * S.ndim
    shape[axis] = n
    w = jnp.exp(-1j * np.pi * (k + 1) / (2 * n)).reshape(shape)
    Xm = S / (1j * w)                       # spectrum entries m = 1..n
    zero = jnp.zeros_like(jnp.take(Xm, jnp.asarray([0]), axis=axis))
    head = jnp.take(Xm, jnp.arange(0, n - 1), axis=axis)
    X = jnp.concatenate([zero, Xm, jnp.conj(jnp.flip(head, axis=axis))],
                        axis=axis)
    ext = jnp.fft.ifft(X, axis=axis)
    return jnp.real(jnp.take(ext, jnp.arange(n), axis=axis))


class FFTPoissonSolver:
    """Direct solver for alpha*u + beta*(1/J) d(Jg d u) on uniform grids
    (J = 1, g = I), with per-axis periodic / hom-Neumann / hom-Dirichlet
    BCs."""

    def __init__(self, geo: LevelGeometry, bcs: FieldBCs, dtype=jnp.float32):
        grid = geo.grid
        assert geo.is_uniform, "FFT path requires a uniform Cartesian map"
        self.grid = grid
        self.dtype = dtype
        self.kinds = []      # per array axis: 'fft' | 'dct'
        lam_total = jnp.zeros(grid.shape)
        for d in range(grid.ndim):
            ax = grid.axis(d)
            n = grid.nx[d]
            dx = grid.dx[d]
            blo = bcs.lo[d]
            if blo.type == BCType.PERIODIC:
                kind = "fft"
                k = np.arange(n)
                lam = (2.0 * np.cos(2.0 * np.pi * k / n) - 2.0) / dx**2
            elif blo.type == BCType.NEUMANN and blo.value == 0.0 \
                    and bcs.hi[d].type == BCType.NEUMANN:
                kind = "dct"
                k = np.arange(n)
                lam = (2.0 * np.cos(np.pi * k / n) - 2.0) / dx**2
            elif blo.type == BCType.DIRICHLET and blo.value == 0.0 \
                    and bcs.hi[d].type == BCType.DIRICHLET \
                    and bcs.hi[d].value == 0.0:
                kind = "dst"
                k = np.arange(n)
                lam = (2.0 * np.cos(np.pi * (k + 1) / n) - 2.0) / dx**2
            else:
                raise ValueError(
                    f"FFT solver: unsupported BC {blo.type} in dir {d}")
            self.kinds.append((ax, kind))
            shape = [1] * grid.ndim
            shape[ax] = n
            lam_total = lam_total + jnp.asarray(lam.reshape(shape))
        self.lam = lam_total
        self.singular = True   # all qualifying BC combos have a null mode

    @staticmethod
    def supports(geo: LevelGeometry, bcs: FieldBCs) -> bool:
        if not geo.is_uniform:
            return False
        for d in range(geo.grid.ndim):
            lo, hi = bcs.lo[d], bcs.hi[d]
            ok = (lo.type == BCType.PERIODIC and hi.type == BCType.PERIODIC) \
                or (lo.type == BCType.NEUMANN and hi.type == BCType.NEUMANN
                    and lo.value == 0.0 and hi.value == 0.0) \
                or (lo.type == BCType.DIRICHLET
                    and hi.type == BCType.DIRICHLET
                    and lo.value == 0.0 and hi.value == 0.0)
            if not ok:
                return False
        return True

    def _forward(self, x):
        for ax, kind in self.kinds:
            if kind == "fft":
                x = jnp.fft.fft(x, axis=ax)
            elif kind == "dct":
                x = _dct2(x, ax)
            else:
                x = _dst2(x, ax)
        return x

    def _inverse(self, X):
        for ax, kind in reversed(self.kinds):
            if kind == "fft":
                X = jnp.fft.ifft(X, axis=ax)
            elif kind == "dct":
                # _idct2 uses a conjugate (antilinear); apply it to the
                # real and imaginary parts separately so FFT spectra on
                # other axes pass through untouched
                X = _idct2(jnp.real(X), ax) + 1j * _idct2(jnp.imag(X), ax)
            else:
                X = _idst2_real(jnp.real(X), ax) \
                    + 1j * _idst2_real(jnp.imag(X), ax)
        return X

    def solve(self, rhs, alpha=0.0, beta=1.0):
        """Exact solve; the k=0 (null) mode is zeroed when alpha == 0."""
        X = self._forward(rhs.astype(jnp.float32))
        denom = alpha + beta * self.lam
        # guard the singular constant mode (denominator 0 when alpha = 0)
        safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
        X = jnp.where(jnp.abs(denom) > 1e-12, X / safe, 0.0)
        out = self._inverse(X)
        out = jnp.real(out)
        # normalize transform scalings: FFT pairs are exact; DCT and DST
        # pairs as implemented are exact inverses (verified in tests)
        return out.astype(self.dtype)
