"""Multi-chip sharding: the TPU replacement for Chombo's MPI decomposition.

Reference parallelism (SURVEY.md section 5.8): boxes assigned to MPI ranks
by LoadBalance; all communication via Copier-driven exchange()/copyTo and
reductions.  TPU-native equivalent: one dense array per field sharded over
a jax.sharding.Mesh of the horizontal direction(s); halo motion is the
collective-permute XLA's SPMD partitioner inserts for shifted slices, and
every norm/sum lowers to an all-reduce over ICI.  There is no hand-written
NCCL/MPI analog to port — the partitioner owns data motion, we own layout.

Layout policy: shard x (the last, lane-aligned array axis) first, then y.
The vertical axis is NEVER sharded — vertical line solves (leptic,
LineGSRB) and the terrain-following metric keep whole columns on-chip,
exactly the property SOMAR's leptic solver exploits (vertical solves are
embarrassingly parallel across columns).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from somar_tpu.core.grid import Grid


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axes=("x",)) -> Mesh:
    """1D mesh over x, or 2D ('y','x') mesh for 3D domains."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if len(axes) == 1:
        return Mesh(np.asarray(devices), axes)
    # split n into a near-square (ny, nx) factorization, nx >= ny
    ny = int(np.floor(np.sqrt(n)))
    while n % ny:
        ny -= 1
    nx = n // ny
    return Mesh(np.asarray(devices).reshape(ny, nx), axes)


def cc_spec(grid: Grid, mesh: Mesh) -> P:
    """PartitionSpec for a CC field: x on the 'x' mesh axis (last array
    axis), y on 'y' if present; vertical replicated."""
    names = [None] * grid.ndim
    names[grid.axis(0)] = "x" if "x" in mesh.axis_names else None
    if grid.ndim == 3 and "y" in mesh.axis_names:
        names[grid.axis(1)] = "y"
    return P(*names)


def state_sharding(grid: Grid, mesh: Mesh, leading_dims: int = 0):
    """NamedSharding for arrays shaped (extra...,)+grid.shape."""
    spec = cc_spec(grid, mesh)
    full = P(*([None] * leading_dims + list(spec)))
    return NamedSharding(mesh, full)


def shard_ns_state(state, grid: Grid, mesh: Mesh):
    """Place an NSState's arrays on the mesh with the standard layout."""
    def place(x):
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        lead = x.ndim - grid.ndim
        return jax.device_put(x, state_sharding(grid, mesh, lead))

    return jax.tree_util.tree_map(place, state)
