"""Taylor-Green vortex: the exact-solution validation problem.

Reference: `/root/reference/src/BCutil/TaylorGreenBCUtil.H:60-78`,
kernels FILL_CARTVELSOLN / FILL_PRESSURESOLN (TaylorGreenBCUtilF.ChF):

    u =  sin(kx (x - U0 t)) cos(ky y) F(t) + U0
    v = -cos(kx (x - U0 t)) sin(ky y) F(t)
    p = (F(t)^2 / 4)(cos(2 kx (x - U0 t)) + cos(2 ky y))
    F(t) = exp(-nu (kx^2 + ky^2) t)

with kx = 2 pi / Lx, ky = 2 pi / Ly, periodic in both directions.
Error norms against the exact solution give the convergence-rate test
that anchors the whole NS stack.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from somar_tpu.geometry.level_geometry import LevelGeometry
from somar_tpu.problems.base import Problem


class TaylorGreen(Problem):
    name = "TaylorGreen"
    num_scalars = 1               # passive here (gravityMethod=0 config)
    use_background_scalar = False

    def __init__(self, lengths=(1.0, 1.0), nu: float = 0.0, u0: float = 0.0):
        self.L = tuple(float(v) for v in lengths)
        self.nu = float(nu)
        self.u0 = float(u0)
        self.kx = 2.0 * np.pi / self.L[0]
        self.ky = 2.0 * np.pi / self.L[-1]

    def _phys(self, geo: LevelGeometry):
        xs = geo.phys_coords_cc()
        shape = geo.grid.shape
        x = np.broadcast_to(xs[0], shape)
        y = np.broadcast_to(xs[geo.ndim - 1], shape)
        return x, y

    def f_of_t(self, t):
        return jnp.exp(-self.nu * (self.kx**2 + self.ky**2) * t)

    def vel_soln(self, geo: LevelGeometry, t):
        x, y = self._phys(geo)
        F = self.f_of_t(t)
        ax = self.kx * (jnp.asarray(x) - self.u0 * t)
        ay = self.ky * jnp.asarray(y)
        u = jnp.sin(ax) * jnp.cos(ay) * F + self.u0
        v = -jnp.cos(ax) * jnp.sin(ay) * F
        if geo.ndim == 2:
            return jnp.stack([u, v])
        w = jnp.zeros_like(u)
        return jnp.stack([u, w, v])  # vortex in the x-z plane

    def pressure_soln(self, geo: LevelGeometry, t):
        x, y = self._phys(geo)
        F = self.f_of_t(t)
        ax = 2.0 * self.kx * (jnp.asarray(x) - self.u0 * t)
        ay = 2.0 * self.ky * jnp.asarray(y)
        return 0.25 * F * F * (jnp.cos(ax) + jnp.cos(ay))

    def vel_ic(self, geo: LevelGeometry):
        return self.vel_soln(geo, 0.0)

    def scalar_ic(self, geo: LevelGeometry, comp: int = 0):
        return jnp.zeros(geo.grid.shape)
