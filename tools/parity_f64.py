"""f64-vs-f32 parity artifact on the 2D lock exchange (reference is
all-double; `amr.precision = 64` is the run-mode knob).

Runs the SAME shipped config at both precisions in subprocesses (x64 is a
global jax switch) and reports the front trajectory + total-energy series
at each precision plus their max deviations.  Writes docs/PARITY_F64.json.

Usage:  python tools/parity_f64.py [steps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CODE = """
import json, sys
import numpy as np
import jax, jax.numpy as jnp
from somar_tpu.config.context import ProblemContext

prec, steps = sys.argv[1], int(sys.argv[2])
ctx = ProblemContext.from_file(
    "/root/reference/exec/inputs.LockExchange_Cartesian2D.machine",
    ["amr.maxsteps=0", "amr.nx=128 32", "amr.nx_offset=-64 0",
     "amr.maxlevel=0", "plot.plot_interval=-1",
     "plot.checkpoint_interval=-1", "amr.verbosity=0",
     "amr.fixed_dt=0.02", f"amr.precision={prec}"])
from somar_tpu.driver import RunDriver
drv = RunDriver(ctx, out_dir="/tmp/parity_f64_" + prec)
level = drv.level
state = level.post_initialize(level.initial_state())
assert state.vel.dtype == (jnp.float64 if prec == "64" else jnp.float32), \
    state.vel.dtype
step = jax.jit(lambda s, d: level.advance(s, d))
dt = jnp.asarray(0.02, state.vel.dtype)
x = np.asarray(level.geo.phys_coords_cc()[0]) * np.ones(level.grid.shape)
fronts, energies = [], []
for i in range(steps):
    state = step(state, dt)
    b = np.asarray(state.scalars[0])
    # front = rightmost x where the bottom-row buoyancy deficit reaches
    # the midpoint value
    row = b[-1]
    xs = x[-1]
    m = row < 0.5 * (row.max() + row.min())
    fronts.append(float(xs[m].max()) if m.any() else float("nan"))
    energies.append(float(level.total_energy(state)))
print(json.dumps({"front": fronts, "energy": energies}))
"""


def run(prec: str, steps: int) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _HERE
    r = subprocess.run([sys.executable, "-c", _CODE, prec, str(steps)],
                       env=env, capture_output=True, text=True, cwd=_HERE)
    if r.returncode != 0:
        sys.stderr.write(r.stderr)
        raise SystemExit(1)
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    d32 = run("32", steps)
    d64 = run("64", steps)
    import numpy as np
    f32, f64 = np.array(d32["front"]), np.array(d64["front"])
    e32, e64 = np.array(d32["energy"]), np.array(d64["energy"])
    out = {
        "config": "inputs.LockExchange_Cartesian2D.machine @ 128x32",
        "steps": steps,
        "front_f32": d32["front"], "front_f64": d64["front"],
        "energy_f32": d32["energy"], "energy_f64": d64["energy"],
        "front_max_abs_dev": float(np.nanmax(np.abs(f32 - f64))),
        "energy_max_rel_dev": float(
            np.max(np.abs(e32 - e64) / np.abs(e64))),
    }
    os.makedirs(os.path.join(_HERE, "docs"), exist_ok=True)
    with open(os.path.join(_HERE, "docs", "PARITY_F64.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if not isinstance(v, list)}, indent=1))


if __name__ == "__main__":
    main()
