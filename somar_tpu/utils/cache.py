"""Persistent-compile-cache location helper.

XLA:CPU stores AOT-compiled executables in the persistent cache keyed by
the *compiling* machine's CPU features, and loads them on a different
host anyway (with a "could lead to execution errors such as SIGILL"
warning).  Measured consequence: gather-heavy programs cached on a
+prefer-no-gather host returned numerically different results on a host
without that feature.  CPU-backend runs therefore get a cache directory
suffixed with a short hash of the host's CPU flags, so each machine
keeps its own CPU cache; accelerator (TPU) runs share the plain
directory — their executables are keyed by the device target, not the
host.
"""

from __future__ import annotations

import hashlib
import os
import platform


def machine_tag() -> str:
    """Short stable id of this host's CPU feature set."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        pass
    if not flags:
        flags = (platform.processor() or platform.machine() or "unknown")
    return hashlib.sha1(flags.encode()).hexdigest()[:8]


def compile_cache_dir(base: str) -> str:
    """Cache dir for the backend the process will use: host-keyed for
    CPU (see module docstring), shared for accelerators."""
    plats = os.environ.get("JAX_PLATFORMS", "")
    if "cpu" in [p.strip() for p in plats.split(",") if p.strip()]:
        return f"{base}-cpu-{machine_tag()}"
    return base
