#!/usr/bin/env python
"""somar_tpu CLI — the `exec/somar.cpp` equivalent.

Usage:  python somar.py <input_file> [key=value overrides...]

Reads a reference-format input file (the shipped exec/inputs.* work
unchanged), builds the problem, and runs the time loop with plot /
checkpoint output.  `python somar.py inputs.TaylorGreen.machine
amr.maxsteps=10` overrides any key from the command line, like Chombo's
ParmParse (somar.cpp:120).
"""

import sys


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 1
    in_file = argv[1]
    overrides = argv[2:]

    import os

    import jax

    from somar_tpu.config.context import ProblemContext
    from somar_tpu.driver import RunDriver

    # persistent compilation cache: a 512-class step costs minutes to
    # compile cold; cache hits bring restarts/param-sweeps to seconds
    from somar_tpu.utils.cache import compile_cache_dir
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        compile_cache_dir(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    ctx = ProblemContext.from_file(in_file, overrides)
    driver = RunDriver(ctx)
    state, steps = driver.run()
    print(f"finished {steps} steps at t = {float(state.time):.6g}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
