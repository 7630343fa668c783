"""somar_tpu — a TPU-native stratified-ocean Navier-Stokes framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of UNC-CFD/somar
(SOMAR: Stratified Ocean Model with Adaptive Refinement): nonhydrostatic,
incompressible (Boussinesq) Navier-Stokes on mapped curvilinear grids with
background-stratification splitting, semi-implicit buoyancy, anisotropic
space-time refinement and anisotropic elliptic solvers (semicoarsening
multigrid + leptic expansion).

Design notes (TPU-first, not a port):
  * State is a pytree of dense arrays; one array per field per level.
  * Array layout is vertical-major: a 3D field is stored [z, y, x] so that
    x rides the 128-wide TPU lane dimension and vertical line solves scan
    over axis 0 with fully-vectorized horizontal planes.  Logical direction
    ``d`` (0=x, 1=y, 2=z; vertical = ndim-1, as in the reference) maps to
    array axis ``ndim-1-d``.
  * Boundary conditions are functional ghost fills (pad-and-fill), fused by
    XLA into the stencils that consume them.
  * Metric terms (J, J g^ij, ...) are precomputed arrays in LevelGeometry
    with static `is_uniform` / `is_diagonal` flags selecting fast paths at
    trace time.
  * Multi-chip scaling shards the horizontal dimensions over a
    jax.sharding.Mesh; halo motion is XLA-inserted collectives.
"""

__version__ = "0.1.0"

from somar_tpu.core.grid import Grid
from somar_tpu.core.bc import BCType, BC, FieldBCs
from somar_tpu.geometry.level_geometry import LevelGeometry

__all__ = [
    "Grid",
    "BCType",
    "BC",
    "FieldBCs",
    "LevelGeometry",
]
