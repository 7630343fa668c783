"""A/B micro-benchmark: MG transfer operators as reshape-mean/broadcast
(current) vs strided convolutions (MXU-native, no lane relayouts).

Run on TPU: python tools/bench_transfers.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

N_LO, N_HI = 2, 10


def _time_call(fn, *args, reps=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(1e3 * (time.perf_counter() - t0))
    ts.sort()
    return ts[len(ts) // 2]


def per_iter(body, x0, label):
    import jax

    def loop(n):
        @jax.jit
        def f(x):
            return jax.lax.fori_loop(0, n, lambda _, y: body(y), x)
        return f

    t_lo = _time_call(loop(N_LO), x0)
    t_hi = _time_call(loop(N_HI), x0)
    ms = (t_hi - t_lo) / (N_HI - N_LO)
    print(f"{label:40s} {ms:8.3f} ms/iter")
    return ms


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from somar_tpu.core.grid import Grid
    from somar_tpu.solvers.multigrid import (restrict_fullweight,
                                             prolong_linear_mg,
                                             prolong_const)
    from somar_tpu.ops.mg_transfers_conv import (restrict_conv,
                                                 prolong_linear_conv)

    nz, ny, nx = 128, 128, 512
    grid = Grid(nx=(nx, ny, nz), dx=(15.0 / nx, 2.0 / ny, 2.0 / nz),
                x0=(-7.5, 0.0, 0.0), periodic=(False, True, False))
    key = jax.random.PRNGKey(0)
    fine = jax.random.normal(key, (nz, ny, nx), jnp.float32)
    coarse = jax.random.normal(key, (nz // 2, ny // 2, nx // 2),
                               jnp.float32)
    ratio = (2, 2, 2)
    print(f"device: {jax.devices()[0].platform}")

    # correctness first
    a = restrict_fullweight(fine, grid, ratio)
    b = restrict_conv(fine, grid, ratio)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"restrict conv vs reshape max err: {err:.2e}")
    a = prolong_linear_mg(coarse, grid, ratio, grid.periodic)
    b = prolong_linear_conv(coarse, grid, ratio, grid.periodic)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"prolong conv vs legacy max err:   {err:.2e}")

    # chained round trips keep shapes constant
    per_iter(lambda f: prolong_linear_mg(
        restrict_fullweight(f, grid, ratio), grid, ratio, grid.periodic),
        fine, "reshape restrict + legacy prolong")
    per_iter(lambda f: prolong_linear_conv(
        restrict_conv(f, grid, ratio), grid, ratio, grid.periodic),
        fine, "conv restrict + conv prolong")
    per_iter(lambda f: prolong_linear_mg(
        restrict_conv(f, grid, ratio), grid, ratio, grid.periodic),
        fine, "conv restrict + legacy prolong")
    per_iter(lambda f: prolong_const(
        restrict_fullweight(f, grid, ratio), grid, ratio),
        fine, "reshape restrict + const prolong")


if __name__ == "__main__":
    main()
