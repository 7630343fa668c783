"""Hierarchical wall-clock timers.

Re-design of Chombo's CH_TIME scoped timers as used throughout the
reference (e.g. LepticAMR.cpp:717,959; report at exec/somar.cpp:222
CH_TIMER_REPORT): nested `with timer("name")` scopes accumulate
wall-clock + call counts; `report()` prints the tree.  Device work is
asynchronous under jit, so scopes that should attribute device time must
block (pass `block=...` or wrap the jitted call with `timed_blocked`).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class _Node:
    __slots__ = ("name", "total", "calls", "children")

    def __init__(self, name: str):
        self.name = name
        self.total = 0.0
        self.calls = 0
        self.children: Dict[str, "_Node"] = {}


class TimerRegistry:
    def __init__(self):
        self.root = _Node("total")
        self._stack: List[_Node] = [self.root]

    @contextlib.contextmanager
    def __call__(self, name: str, block=None):
        parent = self._stack[-1]
        node = parent.children.setdefault(name, _Node(name))
        self._stack.append(node)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block is not None:
                import jax
                jax.block_until_ready(block)
            node.total += time.perf_counter() - t0
            node.calls += 1
            self._stack.pop()

    def report(self, file=None) -> str:
        lines = ["--- timer report (CH_TIMER_REPORT analog) ---"]

        def walk(node: _Node, depth: int):
            for child in node.children.values():
                lines.append(f"{'  ' * depth}{child.name}: "
                             f"{child.total:.3f}s  ({child.calls} calls)")
                walk(child, depth + 1)

        walk(self.root, 0)
        text = "\n".join(lines)
        if file is not None:
            print(text, file=file)
        return text

    def reset(self):
        self.root = _Node("total")
        self._stack = [self.root]


#: the global registry (CH_TIME uses a global table too)
timer = TimerRegistry()
