"""criteria3d_tpu — a TPU-native catchment agro-hydrology framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
ARPA-SIMC/CRITERIA3D: coupled 3D Richards (subsurface) + 2D diffusive-wave
Saint-Venant (surface) water flow, soil heat transport, meteorological
interpolation, solar radiation, snow, crop water uptake, slope stability and
soil-carbon process models.

Design (see SURVEY.md §7): the reference's "unstructured" node graph is
structurally a dense 3-D box (layer, row, col) with a validity mask — links are
only up/down/8-lateral-neighbour (reference: src/project3D/project3D.cpp:941-1103).
All fields here are dense masked ``(L, R, C)`` arrays; link fluxes are stencil
ops; the implicit Picard+Jacobi step runs fully on device under ``lax.while_loop``
and scales across chips with ``shard_map``/``pjit`` domain decomposition.

Float64 note: the reference solver is FP64 throughout
(agrolib/soilFluxes3D/types_gpu.h:34); matric potential spans ~12 orders of
magnitude and mass-balance closure at 1e-3 is the acceptance gate, so this
package enables JAX x64 mode on import.
"""

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from criteria3d_tpu.core.soil import SoilFields, WRCModel, MeanType
from criteria3d_tpu.core.grid import Grid, BoundaryType
from criteria3d_tpu.core.state import WaterState, BalanceData, SolverParameters
from criteria3d_tpu.solver.step import compute_step, compute_period

__all__ = [
    "SoilFields",
    "WRCModel",
    "MeanType",
    "Grid",
    "BoundaryType",
    "WaterState",
    "BalanceData",
    "SolverParameters",
    "compute_step",
    "compute_period",
]
