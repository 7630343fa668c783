"""Shared TPU timing helpers for the tools/ benchmarks.

Ground rules (learned the hard way, see docs/STATUS.md perf log and
VERDICT r4):
  * identical-args dispatches are served from a relay cache — vary an
    input value every call;
  * `block_until_ready` is NOT a completion barrier through the axon
    relay (measured returning in 0.03 ms from a 320 ms in-flight chained
    loop) — every timed region must END IN A HOST READBACK of (at
    least) one output scalar;
  * per-dispatch+readback latency is large and noisy (~25-40 ms) —
    single ops must be timed as the DIFFERENCE between an N-iteration
    and an M-iteration in-jit chained loop, which cancels it.
"""

from __future__ import annotations

import time


def sync(tree) -> float:
    """Completion barrier: 4-byte readback of one output buffer."""
    import jax
    import numpy as np
    leaf = jax.tree_util.tree_leaves(tree)[0]
    idx = (0,) * getattr(leaf, "ndim", 0)
    return float(np.asarray(leaf[idx] if idx else leaf))


def time_dispatch(fn, make_args, reps: int = 5) -> float:
    """Median wall ms of fn(*make_args(i)) + readback, i varying."""
    sync(fn(*make_args(0)))
    ts = []
    for i in range(reps):
        args = make_args(i + 1)
        sync(args)
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(1e3 * (time.perf_counter() - t0))
    ts.sort()
    return ts[len(ts) // 2]


def per_iter(body, x0, label: str = "", n_lo: int = 2, n_hi: int = 10,
             reps: int = 5) -> float:
    """Median per-iteration ms of the chained map x -> body(x), from the
    dispatch+readback difference of in-jit fori_loops of n_lo and n_hi
    iterations.  A per-call traced scalar rescales the input inside the
    jit and the loop output folds to ONE scalar (4-byte readback)."""
    import jax
    import jax.numpy as jnp

    def loop(n):
        @jax.jit
        def f(x, s):
            x = jax.tree_util.tree_map(lambda a: a * s, x)
            out = jax.lax.fori_loop(0, n, lambda _, y: body(y), x)
            return jax.tree_util.tree_reduce(
                lambda acc, a: acc + jnp.sum(a), out, jnp.float32(0.0))
        return f

    def args(i):
        return (x0, jnp.float32(1.0 + 1e-6 * i))

    t_lo = time_dispatch(loop(n_lo), args, reps)
    t_hi = time_dispatch(loop(n_hi), args, reps)
    ms = (t_hi - t_lo) / (n_hi - n_lo)
    if label:
        print(f"{label:44s} {ms:8.3f} ms/iter   "
              f"(dispatch {t_lo:.1f} / {t_hi:.1f})")
    return ms
