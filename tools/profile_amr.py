"""Per-phase profiling of the AMR coarse step (VERDICT r4 #6).

The shipped 3D lock-exchange config with maxlevel=1 (4 1 1 refinement):
attributes the coarse step between the base advance, the subcycled fine
advances, CF transfers, and the postTimeStep sync (reflux/avgdown/sync
projection/VD).  Honest timing per tools/timing.py.

Usage: python tools/profile_amr.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from timing import per_iter  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bench import _driver_from_config

    drv = _driver_from_config(
        "/root/reference/exec/inputs.LockExchange_Cartesian3D.machine",
        ["plot.plot_interval=-1", "plot.checkpoint_interval=-1",
         "amr.verbosity=0", "amr.maxsteps=2"], "amrprof")
    h = drv.hierarchy
    level0 = h.level0
    state = level0.post_initialize(level0.initial_state())
    got = h.initial_patch_states(state)
    if h.multi_patch:
        fine, origin, weights = got
    else:
        (fine, origin), weights = got, None
    dt = jnp.asarray(0.01, jnp.float32)
    c = h.couplings[0]
    print(f"device: {jax.devices()[0].platform}  base: {drv.grid.nx}  "
          f"patch: {c.ext_nx} x{c.K}  nt: {c.nt}  "
          f"sync_proj: {h.do_sync_projection} "
          f"({h.sync_projection_iters} it x {h.sync_composite_iters} "
          f"composite)")
    updates = drv.grid.ncells
    factor = 1
    for cc in h.couplings:
        factor *= cc.nt
        updates += factor * cc.K * int(np.prod(cc.ext_nx))
    print(f"cell updates / coarse step: {updates}")

    # full coarse step (chained)
    def full(sf):
        s, f = sf
        s2, f2 = h.advance(s, f, origin, dt, None, weights)
        return (s2, f2)

    t_full = per_iter(full, (state, fine), "full coarse step", n_lo=1,
                      n_hi=4)

    # base-level advance alone
    t_base = per_iter(lambda s: level0.advance(s, dt), state,
                      "base advance alone", n_lo=1, n_hi=4)

    # fine-level: one substep of the patch level (xnt for the subcycle)
    lev1 = c.level
    f1 = fine[0] if isinstance(fine, (list, tuple)) else fine

    def fine_sub(f):
        if c.K > 1:
            import jax as _j
            return _j.vmap(lambda x: lev1.advance(x, dt / c.nt))(f)
        return lev1.advance(f, dt / c.nt)

    t_sub = per_iter(fine_sub, f1, "one fine substep (all patches)",
                     n_lo=1, n_hi=4)

    # no-sync variant isolates the postTimeStep sync cost
    h.do_sync_projection = False
    try:
        t_nosync = per_iter(full, (state, fine),
                            "coarse step, sync projection OFF", n_lo=1,
                            n_hi=4)
    finally:
        h.do_sync_projection = True

    print("--- attribution (ms/coarse step) ---")
    print(f"{'base advance':28s} {t_base:8.2f}")
    print(f"{'fine substeps (x nt)':28s} {t_sub * c.nt:8.2f}  "
          f"({t_sub:.2f} each x {c.nt})")
    print(f"{'sync projection + VD':28s} {t_full - t_nosync:8.2f}")
    rest = t_full - t_base - t_sub * c.nt - (t_full - t_nosync)
    print(f"{'transfers/CF/reflux (rest)':28s} {rest:8.2f}")
    print(f"{'TOTAL':28s} {t_full:8.2f}  "
          f"=> {updates / t_full * 1e3 / 1e6:.1f}M cups")


if __name__ == "__main__":
    main()
