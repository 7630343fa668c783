"""BiCGStab Krylov solver (MG bottom solve + leptic fallback).

Re-design of Chombo's BiCGStabSolver as used by the reference for the MG
bottom solve (`/root/reference/exec/GNUmakefile` links BoxTools; solver mux
at AMRPressureSolver.H:43-197) and the leptic solver's Krylov fallback
(LevelLepticSolver.cpp:851-874).  Implemented as a `lax.while_loop` so the
whole Krylov iteration lives inside the jitted solve; the operator is any
closure A(x) -> Ax on CC arrays.

Parameters mirror the reference's `bottom.*` namespace
(ProblemContext.cpp): eps, reps, imax, hang, small, numRestarts.

Like Chombo's BiCGStabSolver, the iteration RESTARTS (fresh shadow
residual r0 = r, zeroed search directions) on rho/omega breakdown or when
the residual stalls — BiCGStab's per-iteration residual is non-monotone,
so a plain "no improvement this iteration" exit aborts otherwise-healthy
solves.  Stall = no improvement over the best residual for several
iterations.
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
    hang: float = 1e-8     # bottom.hang: min relative gain per stall window
    small: float = 1e-30   # bottom.small
    num_restarts: int = 5  # bottom.numRestarts
    stall_iters: int = 8   # iterations without a new best before restart
    #: bottom.reps: secondary convergence floor relative to |rhs| — the
    #: solve also exits when |r| <= reps * |rhs| (Chombo BiCGStabSolver's
    #: m_reps small-RHS escape)
    reps: float = 1e-12
    #: bottom.normType: 0 = max norm, otherwise L2 (Chombo m_normType)
    norm_type: int = 2


def _dot(a, b):
    return jnp.sum(a.astype(jnp.float32) * b.astype(jnp.float32))


def _norm(a, norm_type: int):
    if norm_type == 0:
        return jnp.max(jnp.abs(a))
    return jnp.sqrt(_dot(a, a))


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
    norm0 = _norm(r, p.norm_type)
    norm0s = jnp.maximum(norm0, p.small)
    normb = jnp.maximum(_norm(rhs, p.norm_type), p.small)

    prec = (lambda v: v) if M is None else M

    v = jnp.zeros_like(rhs)
    pvec = jnp.zeros_like(rhs)
    one = jnp.asarray(1.0, r.dtype)
    # (x, r, r0, pvec, v, rho, alpha, omega, rnorm,
    #  rbest, stall, restarts, it)
    state = (x, r, r0, pvec, v, rho, one, one, norm0,
             norm0, jnp.asarray(0), jnp.asarray(0), jnp.asarray(0))

    def cond(s):
        (_, _, _, _, _, _, _, _, rnorm, _, _, restarts, it) = s
        unconverged = (rnorm > p.eps * norm0s) & (rnorm > p.reps * normb)
        return (it < p.imax) & unconverged & (restarts <= p.num_restarts)

    def body(s):
        (x, r, r0, pvec, v, rho_old, alpha, omega, rnorm,
         rbest, stall, restarts, it) = s
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
        rnew = _norm(r, p.norm_type)

        improved = rnew < (1.0 - p.hang) * rbest
        rbest = jnp.minimum(rbest, rnew)
        stall = jnp.where(improved, 0, stall + 1)
        breakdown = (jnp.abs(rho) <= p.small) | (jnp.abs(omega) <= p.small)
        need_restart = breakdown | (stall >= p.stall_iters)

        def do_restart(args):
            x, _, _, _, _, restarts = args
            r = rhs - A(x)
            rho = _dot(r, r)
            return (x, r, r, jnp.zeros_like(r), jnp.zeros_like(r), rho,
                    one, one, _norm(r, p.norm_type), restarts + 1,
                    jnp.asarray(0))

        def no_restart(args):
            x, r, pvec, v, rho, restarts = args
            return (x, r, r0, pvec, v, rho, alpha, omega, rnew, restarts,
                    stall)

        (x, r, r0n, pvec, v, rho, alpha, omega, rnew, restarts, stall) = \
            jax.lax.cond(need_restart, do_restart, no_restart,
                         (x, r, pvec, v, rho, restarts))
        return (x, r, r0n, pvec, v, rho, alpha, omega, rnew,
                jnp.minimum(rbest, rnew), stall, restarts, it + 1)

    out = jax.lax.while_loop(cond, body, state)
    x, rnorm, it = out[0], out[8], out[12]
    return x, (it, rnorm / norm0s)
