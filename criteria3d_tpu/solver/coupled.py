"""Coupled water + heat stepping.

Mirrors computeStep's heat sub-stepping driver (soilFluxes3D.cpp:1785-1821 +
CPUSolver::run, cpusolver.cpp:77-91): each accepted water step of length
dtWater is covered by heat sub-steps dtHeat <= dtWater, each Courant-limited
by the atmospheric boundary flux (updateBoundaryHeatData, heat.cpp:237-341)
and halved when the heat balance fails (|heatMBR| > 1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from criteria3d_tpu.core.grid import Grid
from criteria3d_tpu.core.state import SolverParameters, WaterState
from criteria3d_tpu.solver import heat as H
from criteria3d_tpu.solver.step import _compute_step

__all__ = ["compute_step_coupled"]


@partial(jax.jit, static_argnames=("params", "max_substeps"))
def compute_step_coupled(grid: Grid, params: SolverParameters,
                         water: WaterState, heat_state: H.HeatState,
                         boundary: H.HeatBoundary, max_time_step,
                         max_substeps: int = 16):
    """One adaptive water step followed by its heat sub-steps.

    Returns (water', heat', dt_water). The heat sub-step loop runs on device
    with a bounded iteration count (the reference's while loop halves dtHeat
    on failure; 16 sub-steps cover dtWater down to dtWater/16 < dtMin for
    any practical configuration).
    """
    water_new, dt_water = _compute_step(
        grid, params, water, jnp.asarray(max_time_step, params.dtype))

    def cond(c):
        heat_s, t_done, dt_heat, it = c
        return jnp.logical_and(t_done < dt_water, it < max_substeps)

    def body(c):
        heat_s, t_done, dt_heat, it = c
        dt_heat = jnp.minimum(dt_heat, dt_water - t_done)
        # Courant limitation from the boundary flux
        _, dt_limited, _ = H.update_boundary_heat(
            grid, params, heat_s, boundary, water_new, dt_heat)
        new_heat, mbr = H.heat_step(grid, params, heat_s, boundary,
                                    water_new, dt_limited, dt_water)
        ok = jnp.abs(mbr) <= 1.0
        # on failure heat_step already restored T; halve and retry
        t_next = jnp.where(ok, t_done + dt_limited, t_done)
        dt_next = jnp.where(ok, dt_limited, jnp.maximum(
            dt_limited * 0.5, params.delta_t_min))
        return (new_heat, t_next, dt_next, it + 1)

    heat_final, _, _, _ = lax.while_loop(
        cond, body, (heat_state, jnp.zeros((), params.dtype), dt_water,
                     jnp.zeros((), jnp.int32)))
    return water_new, heat_final, dt_water
