"""Explicit halo exchange: lax.ppermute neighbor shifts inside shard_map.

The default multi-chip path lets XLA's SPMD partitioner insert halo
collectives for shifted slices (somar_tpu/parallel/mesh.py).  This module
is the hand-rolled alternative — the direct analog of the reference's
`LevelData::exchange(Copier)` (SURVEY.md section 5.8) — for shard_map
regions where manual control over ICI traffic pays: one `ppermute` pair
per sharded axis fills a `width`-deep halo from the two neighbors.

Non-periodic global boundaries receive edge-replicated data (the caller's
BC fills own the physical boundary; the garbage-free guarantee matches
the dense-patch halo convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def halo_exchange(block, axis_name: str, ax: int, width: int,
                  periodic: bool = False):
    """Pad `block` with `width` cells from the neighbor shards along the
    mesh axis `axis_name` (array axis `ax`).

    Must be called inside shard_map.  Returns the (n + 2*width) padded
    block.
    """
    n_shards = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)

    def take(arr, lo, hi):
        sl = [slice(None)] * arr.ndim
        sl[ax] = slice(lo, hi)
        return arr[tuple(sl)]

    # slabs to send: my low edge goes to the left neighbor's high halo, etc.
    send_lo = take(block, 0, width)                    # -> left neighbor
    send_hi = take(block, block.shape[ax] - width, block.shape[ax])

    right = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    left = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    # from my left neighbor's high edge: permute send_hi rightward
    from_left = lax.ppermute(send_hi, axis_name, right)
    from_right = lax.ppermute(send_lo, axis_name, left)

    if not periodic:
        # first/last shard: replicate own edge instead of wrapping
        from_left = jnp.where(idx == 0, take(block, 0, width), from_left)
        from_right = jnp.where(idx == n_shards - 1,
                               take(block, block.shape[ax] - width,
                                    block.shape[ax]),
                               from_right)
    return jnp.concatenate([from_left, block, from_right], axis=ax)
