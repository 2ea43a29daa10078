"""3-D coupled surface-subsurface flow on a synthetic valley catchment.

Mini version of BASELINE configs 2-3: a tilted-valley DEM with rainfall,
exercising Manning runoff between surface cells, infiltration, 3-D
redistribution, runoff/free-drainage/lateral-drainage boundaries and the
Courant limiter. The acceptance oracle is the reference's own: per-period
mass-balance closure (storage change vs rain + boundary outflow,
project3D.cpp:1365-1385) and |MBR| < threshold.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from criteria3d_tpu import (Grid, SoilFields, SolverParameters, WaterState,
                            compute_period)
from criteria3d_tpu.core.grid import BoundaryType
from criteria3d_tpu.solver import water as W
from criteria3d_tpu.solver.step import initialize_balance


def valley_dem(n=12, cell=10.0):
    """Tilted V-shaped valley draining to row n-1, col centre."""
    rows, cols = np.mgrid[0:n, 0:n]
    z = 100.0 + (n - 1 - rows) * 0.5 + np.abs(cols - n // 2) * 0.8
    return z.astype(np.float64)


@pytest.fixture(scope="module")
def catchment():
    dem = valley_dem()
    soil = SoilFields.uniform(dem.shape, vg_alpha=1.2, vg_n=1.5, vg_he=0.02,
                              theta_s=0.41, theta_r=0.04, k_sat=5e-6)
    grid = Grid.build(dem, 10.0, soil, total_depth=0.8,
                      free_catchment_runoff=True,
                      free_bottom_drainage=True,
                      free_lateral_drainage=True)
    return grid


def test_boundary_assignment(catchment):
    grid = catchment
    bt = np.asarray(grid.btype)
    # the rim has runoff boundary nodes on the surface
    assert (bt[0] == BoundaryType.RUNOFF).sum() > 0
    # interior surface cells are not boundaries
    assert bt[0, 5, 5] == BoundaryType.NONE
    # bottom layer is free drainage everywhere valid
    assert (bt[-1][np.asarray(grid.mask[-1])] == BoundaryType.FREE_DRAINAGE).all()
    # some lateral drainage on the rim soil layers
    assert (bt[1:-1] == BoundaryType.FREE_LATERAL_DRAINAGE).sum() > 0


def test_storm_mass_closure(catchment):
    """One hour of heavy rain: storage change == rain + boundary outflow."""
    grid = catchment
    params = SolverParameters()
    state = WaterState.initialize(grid, params, matric_potential=-1.5)
    state = initialize_balance(grid, params, state)
    s0 = float(state.balance_prev.storage)

    # 20 mm/h rain on every surface cell
    rain_rate = 0.020 * float(grid.area) / 3600.0      # [m3 s-1] per cell
    sink = jnp.zeros_like(state.sink_source)
    sink = sink.at[0].set(jnp.where(grid.mask[0], rain_rate, 0.0))
    state = dataclasses.replace(state, sink_source=sink)

    state = compute_period(grid, params, state, 3600.0)

    s1 = float(W.total_water_content(grid, params, state.h, state.se))
    rain_total = rain_rate * int(np.asarray(grid.mask[0]).sum()) * 3600.0
    boundary_total = float(jnp.sum(state.boundary_flow_sum))  # negative: outflow

    # forecast balance exactly as the reference logs it (project3D.cpp:1375-1382)
    error = (s1 - s0) - (rain_total + boundary_total)
    surface_area = float(grid.area) * grid.n_surface_nodes
    error_mm = error / surface_area * 1000.0
    assert abs(error_mm) < 0.2, f"mass error {error_mm} mm"

    # whole-period MBR is small
    assert abs(float(state.balance_whole.mbr)) < 5e-3

    # rain raised near-surface saturation somewhere
    se = np.asarray(state.se)
    assert se[1][np.asarray(grid.mask[1])].max() > 0.5


def test_runoff_reaches_outlet(catchment):
    """Surface water must flow downslope and exit through the runoff rim."""
    grid = catchment
    params = SolverParameters()
    state = WaterState.initialize(grid, params, matric_potential=-0.5)
    state = initialize_balance(grid, params, state)

    # intense rain: 50 mm over 20 minutes => ponding + runoff
    rain_rate = 0.150 * float(grid.area) / 3600.0
    sink = jnp.zeros_like(state.sink_source)
    sink = sink.at[0].set(jnp.where(grid.mask[0], rain_rate, 0.0))
    state = dataclasses.replace(state, sink_source=sink)

    state = compute_period(grid, params, state, 1200.0)

    runoff_out = float(jnp.sum(jnp.where(
        grid.btype == BoundaryType.RUNOFF, state.boundary_flow_sum, 0.0)))
    assert runoff_out < 0.0  # water left the catchment over the rim

    # ponded water exists and is deeper in the valley axis than on the ridge
    depth = np.asarray(state.surface_water_level(grid))
    assert np.nanmax(depth) > 1e-4
    valley_col = depth.shape[1] // 2
    assert depth[:, valley_col].mean() >= depth[:, 0].mean()


def test_courant_triggers_substepping(catchment):
    """Violent forcing should force dt below dt_max via the Courant limiter."""
    grid = catchment
    params = SolverParameters()
    state = WaterState.initialize(grid, params, matric_potential=-0.5,
                                  surface_water=0.0)
    state = initialize_balance(grid, params, state)

    rain_rate = 0.300 * float(grid.area) / 3600.0      # 300 mm/h deluge
    sink = jnp.zeros_like(state.sink_source)
    sink = sink.at[0].set(jnp.where(grid.mask[0], rain_rate, 0.0))
    state = dataclasses.replace(state, sink_source=sink)

    from criteria3d_tpu import compute_step
    state, dt1 = compute_step(grid, params, state, 3600.0)
    # first step runs at dt_max; subsequent steps see moving surface water
    for _ in range(6):
        state, dt = compute_step(grid, params, state, 3600.0)
    assert float(state.courant) > 0.0
    assert float(dt) < 600.0  # Courant or MBR control reduced the step
