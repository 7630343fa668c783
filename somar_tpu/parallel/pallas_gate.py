"""Shard-locality gate for the Pallas kernel paths.

Pallas kernels lower to custom calls that XLA's GSPMD partitioner cannot
split: reachable inside a jit whose operands are sharded over >1 device,
they force full all-gathers (or fail outright) on real multi-chip
hardware.  The reference has no such hazard — its MPI ranks each run the
Fortran kernels on local boxes unconditionally
(/root/reference/src/NavierStokes/AMRNavierStokesRegrid.cpp:40-56).

The TPU-native equivalent of "rank-local" is "inside jax.shard_map", where
the traced body sees only the per-device block.  This module provides the
trace-time signal:

  * by default, Pallas paths are enabled only when the process owns ONE
    device (a GSPMD partition over a single device is a no-op, so the
    custom call is safe);
  * shard_map island bodies (parallel/sharded_step.py, amr/hierarchy.py
    patch islands) wrap their trace in `pallas_scope(True)` — shard-local
    by construction, so the kernels are safe on any mesh;
  * code that stages a *replicated* computation on a multi-device mesh can
    also opt in with `pallas_scope(True)`;
  * `pallas_scope(False)` force-disables (used by tests and by solvers
    whose operands are GSPMD-sharded).

The scope is consulted at TRACE time (Python), which is when the
`_use_pallas_*` feature gates run, so an ordinary context manager around
the traced region is sufficient — no tracer plumbing needed.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

_tls = threading.local()


def shard_local_scope() -> Optional[bool]:
    """Current explicit scope value, or None when unset (auto)."""
    stack = getattr(_tls, "stack", None)
    return stack[-1] if stack else None


@contextlib.contextmanager
def pallas_scope(allowed: bool):
    """Declare the enclosed trace shard-local (True) or GSPMD-sharded
    (False) for the purpose of Pallas feature gates."""
    stack = getattr(_tls, "stack", None)
    if stack is None:
        stack = _tls.stack = []
    stack.append(bool(allowed))
    try:
        yield
    finally:
        stack.pop()


def default_allowed() -> bool:
    """The auto rule: Pallas custom calls are safe iff the enclosing jit
    cannot be GSPMD-partitioned over >1 device — i.e. the process owns a
    single device — unless an explicit scope says otherwise."""
    import jax

    s = shard_local_scope()
    if s is not None:
        return s
    try:
        return jax.device_count() == 1
    except Exception:
        return False
