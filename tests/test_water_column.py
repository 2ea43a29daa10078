"""1-D vertical Richards column — the minimum end-to-end slice (BASELINE config 1).

A single-cell DEM gives one surface node + a soil column, exercising
infiltration, vertical redistribution, free-drainage bottom BC, the
Picard+Jacobi step and the adaptive-Δt machine. Oracles:

* mass-balance closure: per-step |MBR| < 1e-3 is the reference's own
  acceptance criterion (types.h:293) — checked over the whole run;
* monotone wetting-front behaviour under constant ponded infiltration;
* equilibrium: with no forcing and no drainage, a hydrostatic profile
  (uniform total potential) must be stationary.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from criteria3d_tpu import (Grid, SoilFields, SolverParameters, WaterState,
                            compute_period, compute_step)
from criteria3d_tpu.constants import NODATA
from criteria3d_tpu.core.grid import BoundaryType
from criteria3d_tpu.solver import water as W
from criteria3d_tpu.solver.step import initialize_balance


def make_column(total_depth=1.0, free_drainage=True, runoff=False, n=1):
    """n x n flat DEM at 2 m cell size -> surface + soil layers."""
    dem = np.zeros((n, n))
    soil = SoilFields.uniform((n, n), vg_alpha=1.0, vg_n=1.4, vg_he=0.02,
                              theta_s=0.43, theta_r=0.05, k_sat=1e-5)
    grid = Grid.build(dem, 2.0, soil, total_depth=total_depth,
                      free_catchment_runoff=runoff,
                      free_bottom_drainage=free_drainage,
                      free_lateral_drainage=False)
    return grid


def test_grid_structure():
    grid = make_column()
    L = grid.n_layers
    assert L > 2
    assert grid.layer_depth[0] == 0.0
    assert grid.layer_thickness[1] == pytest.approx(0.02)
    # last layer reaches the computation depth
    assert grid.layer_depth[-1] + grid.layer_thickness[-1] * 0.5 == pytest.approx(1.0)
    assert bool(grid.mask.all())
    assert grid.n_nodes == L
    assert grid.n_surface_nodes == 1
    # bottom layer is free drainage
    assert int(grid.btype[-1, 0, 0]) == BoundaryType.FREE_DRAINAGE
    assert int(grid.btype[1, 0, 0]) == BoundaryType.NONE


def test_hydrostatic_equilibrium_is_stationary():
    """Uniform total potential + no BC flow => nothing moves."""
    grid = make_column(free_drainage=False)
    params = SolverParameters()
    # total potential equal everywhere: H = z_bottom - 0.5 (all unsaturated)
    h_tot = float(grid.z[-1, 0, 0]) - 0.5
    psi = h_tot - np.asarray(grid.z[:, 0, 0])
    state = WaterState.initialize(
        grid, params, matric_potential=jnp.asarray(psi).reshape(-1, 1, 1))
    state = initialize_balance(grid, params, state)

    state, dt = compute_step(grid, params, state, 600.0)
    h_new = np.asarray(state.h[1:, 0, 0])
    np.testing.assert_allclose(h_new, h_tot, atol=1e-9)
    assert float(dt) > 0


def test_free_drainage_decreases_storage():
    grid = make_column(free_drainage=True)
    params = SolverParameters()
    state = WaterState.initialize(grid, params, matric_potential=-0.2)
    state = initialize_balance(grid, params, state)
    s0 = float(state.balance_prev.storage)

    state = compute_period(grid, params, state, 3600.0)

    s1 = float(W.total_water_content(grid, params, state.h, state.se))
    assert s1 < s0  # water drained
    # drainage is accounted in the boundary flow sum (negative = outflow)
    bsum = float(jnp.sum(jnp.where(
        grid.btype == BoundaryType.FREE_DRAINAGE, state.boundary_flow_sum, 0.0)))
    assert bsum < 0
    # mass closure: period MBR small
    assert abs(float(state.balance_whole.mbr)) < 1e-2


def test_ponded_infiltration_wets_profile_and_closes_mass():
    """Rain on the surface: wetting front advances downward, mass closes."""
    grid = make_column(free_drainage=False)
    params = SolverParameters()
    state = WaterState.initialize(grid, params, matric_potential=-2.0)
    state = initialize_balance(grid, params, state)

    # rainfall 10 mm/h on the 4 m2 cell -> [m3 s-1]
    rain = 0.010 * 4.0 / 3600.0
    sink = jnp.zeros_like(state.sink_source).at[0].set(rain)
    import dataclasses
    state = dataclasses.replace(state, sink_source=sink)

    theta0 = np.asarray(W.compute_se(grid, params, state.h))[1:, 0, 0]
    s0 = float(state.balance_prev.storage)

    state = compute_period(grid, params, state, 3600.0)

    se1 = np.asarray(state.se)[1:, 0, 0]
    # top of the profile wetted
    assert se1[0] > theta0[0] + 0.01
    # monotone from the top: deeper layers not wetter than the wetting front
    assert se1[0] >= se1[-1]

    # mass balance: storage change == rain volume (no outflow path)
    s1 = float(W.total_water_content(grid, params, state.h, state.se))
    expected = rain * 3600.0
    assert s1 - s0 == pytest.approx(expected, rel=2e-3)
    assert abs(float(state.balance_whole.mbr)) < 2e-3


def test_step_respects_max_time_step():
    grid = make_column()
    params = SolverParameters()
    state = WaterState.initialize(grid, params, matric_potential=-1.0)
    state = initialize_balance(grid, params, state)
    _, dt = compute_step(grid, params, state, 123.0)
    assert float(dt) <= 123.0 + 1e-12
