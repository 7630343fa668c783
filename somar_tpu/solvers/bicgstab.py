"""BiCGStab Krylov solver (MG bottom solve + leptic fallback).

Re-design of Chombo's BiCGStabSolver as used by the reference for the MG
bottom solve (`/root/reference/exec/GNUmakefile` links BoxTools; solver mux
at AMRPressureSolver.H:43-197) and the leptic solver's Krylov fallback
(LevelLepticSolver.cpp:851-874).  Implemented as a `lax.while_loop` so the
whole Krylov iteration lives inside the jitted solve; the operator is any
closure A(x) -> Ax on CC arrays.

Parameters mirror the reference's `bottom.*` namespace
(ProblemContext.cpp): eps, reps, imax, hang, small.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BiCGStabParams:
    eps: float = 1e-6      # bottom.eps: absolute tolerance (vs initial resid)
    imax: int = 80         # bottom.imax
    hang: float = 1e-8     # bottom.hang
    small: float = 1e-30   # bottom.small


def _dot(a, b):
    return jnp.sum(a.astype(jnp.float32) * b.astype(jnp.float32))


def bicgstab(A: Callable, rhs, x0=None, M: Optional[Callable] = None,
             params: BiCGStabParams = BiCGStabParams(),
             remove_mean: bool = False):
    """Solve A x = rhs.  M is an optional (right) preconditioner closure.

    remove_mean projects out the constant null space each iteration (for
    singular pure-Neumann problems).  Returns (x, (iters, relres)).
    """
    p = params
    x = jnp.zeros_like(rhs) if x0 is None else x0
    if remove_mean:
        rhs = rhs - jnp.mean(rhs)

    r = rhs - A(x)
    r0 = r                      # shadow residual
    rho = _dot(r0, r)
    norm0 = jnp.sqrt(_dot(r, r))
    norm0s = jnp.maximum(norm0, p.small)

    prec = (lambda v: v) if M is None else M

    State = tuple  # (x, r, pvec, v, rho, alpha, omega, rnorm, rprev, it)
    v = jnp.zeros_like(rhs)
    pvec = jnp.zeros_like(rhs)
    state = (x, r, pvec, v, rho, jnp.asarray(1.0, r.dtype),
             jnp.asarray(1.0, r.dtype), norm0, 2.0 * norm0, jnp.asarray(0))

    def cond(s):
        _, _, _, _, rho, _, omega, rnorm, rprev, it = s
        unconverged = rnorm > p.eps * norm0s
        healthy = (jnp.abs(rho) > p.small) & (jnp.abs(omega) > p.small)
        not_hung = (rprev - rnorm) > p.hang * rprev
        return (it < p.imax) & unconverged & healthy & not_hung

    def body(s):
        x, r, pvec, v, rho_old, alpha, omega, rnorm, _, it = s
        rho = _dot(r0, r)
        safe = lambda d: jnp.where(jnp.abs(d) > p.small, d, p.small)
        beta = (rho / safe(rho_old)) * (alpha / safe(omega))
        pvec = r + beta * (pvec - omega * v)
        phat = prec(pvec)
        v = A(phat)
        denom = _dot(r0, v)
        alpha = rho / jnp.where(jnp.abs(denom) > p.small, denom, p.small)
        s_vec = r - alpha * v
        shat = prec(s_vec)
        t = A(shat)
        tt = _dot(t, t)
        omega = _dot(t, s_vec) / jnp.where(tt > p.small, tt, 1.0)
        x = x + alpha * phat + omega * shat
        if remove_mean:
            x = x - jnp.mean(x)
        r = s_vec - omega * t
        rnew = jnp.sqrt(_dot(r, r))
        return (x, r, pvec, v, rho, alpha, omega, rnew, rnorm, it + 1)

    x, r, _, _, _, _, _, rnorm, _, it = jax.lax.while_loop(cond, body, state)
    return x, (it, rnorm / norm0s)
