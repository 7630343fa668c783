"""Stratification utilities: N^2, vertical normal modes, Richardson number.

Re-design of the reference's StratUtils
(`/root/reference/src/utils/StratUtils.H:47-124`): computeBVFreq (N^2),
solveVertEigenProblem (the vertical normal-mode problem solved with LAPACK
DGEEV via lapack.H / SOLVEVERTEIGENPROBLEM kernels, StratUtilsF.ChF:354),
computeGradRiNumber, and the StructurePool cache of vertical structure
functions.

The eigenproblem:  phi'' = -(N^2 / c^2) phi,  phi(0) = phi(-H) = 0.
Discretized on cell centers it is the generalized symmetric problem
D2 phi = lambda diag(N^2) phi with lambda = -1/c^2; we solve it host-side
with scipy (same LAPACK underneath) once per (grid, profile) and cache —
mode shapes are static data for the jitted step, exactly like the metric.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def compute_bv_freq(background, z: np.ndarray) -> np.ndarray:
    """N^2(z) = -d(bbar)/dz (reference: computeBVFreq, StratUtils.H:47)."""
    return np.asarray(background.nsq(z))


def solve_vert_eigen_problem(nsq: np.ndarray, dz: float, nmodes: int = 1
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """First `nmodes` vertical modes (c_j, phi_j(z)) on a cell-centered
    column with phi = 0 at both boundaries.

    nsq: N^2 at the nz cell centers (must be >= 0, nonzero somewhere).
    Returns (c, phi) with c shape (nmodes,) sorted descending and phi shape
    (nmodes, nz) normalized to max |phi| = 1.
    """
    from scipy.linalg import eigh

    nz = nsq.shape[0]
    # Dirichlet second-difference operator at cell centers (ghost = -interior)
    main = np.full(nz, -2.0)
    main[0] -= 1.0   # phi(face) = 0 -> ghost = -c0 -> coupling 3 on diag
    main[-1] -= 1.0
    D2 = (np.diag(main) + np.diag(np.ones(nz - 1), 1)
          + np.diag(np.ones(nz - 1), -1)) / (dz * dz)
    # generalized symmetric-definite problem: -D2 phi = (1/c^2) N^2 phi
    B = np.diag(np.maximum(nsq, 1e-12))
    w, v = eigh(-D2, B)
    # w = 1/c^2 ascending -> c descending
    c = 1.0 / np.sqrt(np.maximum(w[:nmodes], 1e-30))
    phi = v[:, :nmodes].T
    phi = phi / np.max(np.abs(phi), axis=1, keepdims=True)
    # sign convention: positive mean
    sgn = np.sign(phi.sum(axis=1))
    sgn[sgn == 0] = 1.0
    return c, phi * sgn[:, None]


def compute_max_bv_freq(nsq) -> float:
    return float(np.sqrt(np.maximum(np.max(nsq), 0.0)))


def gradient_richardson_number(vel, b_total, geo, dz_axis: int = 0,
                               eps: float = 1e-12):
    """Ri = N^2_local / (du/dz)^2 with N^2_local = -db/dz (reference:
    computeGradRiNumber, StratUtils.H:68-87; used for Ri-based AMR tagging,
    AMRNavierStokesRegrid.cpp:234-252)."""
    import jax.numpy as jnp

    dvert = geo.grid.vertical_dir
    ax = geo.grid.axis(dvert)
    dz = geo.grid.dx[dvert]

    def ddz(f):
        d = jnp.gradient(f, axis=ax) / dz
        return d

    nsq_loc = -ddz(b_total)
    shear2 = sum(ddz(vel[m]) ** 2 for m in range(geo.ndim)) + eps
    return nsq_loc / shear2


class StructurePool:
    """Cache of (c0, phi, dphi/dz) per (nz, dz, profile-id) (reference:
    StructurePool, StratUtils.H:124)."""

    def __init__(self):
        self._cache: Dict = {}

    def get(self, background, z0: float, nz: int, dz: float,
            nmodes: int = 1):
        key = (id(background), round(z0, 12), nz, round(dz, 12), nmodes)
        if key not in self._cache:
            z = z0 + (np.arange(nz) + 0.5) * dz
            nsq = compute_bv_freq(background, z)
            c, phi = solve_vert_eigen_problem(nsq, dz, nmodes)
            dphi = np.gradient(phi, dz, axis=1)
            self._cache[key] = (c, phi, dphi, nsq)
        return self._cache[key]
