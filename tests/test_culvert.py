"""Culvert boundary: rating-curve regimes and pond drainage.

Oracle: the reference rating in updateBoundaryWaterData
(water.cpp:749-795) re-implemented in straight numpy.
"""

import dataclasses
import math

import jax.numpy as jnp
import numpy as np
import pytest

from criteria3d_tpu import Grid, SoilFields, SolverParameters, WaterState
from criteria3d_tpu.core.grid import BoundaryType
from criteria3d_tpu.solver import water as W
from criteria3d_tpu.solver.step import compute_step, initialize_balance

ROUGH, SLOPE, WIDTH, HEIGHT = 0.04, 0.02, 1.5, 0.8


def reference_culvert_flow(water_level, pond):
    """water.cpp:760-795 verbatim (given the water level above invert)."""
    if water_level >= 1.5 * HEIGHT:
        d = math.sqrt(4.0 * WIDTH * HEIGHT / math.pi)
        return 70.0 * SLOPE ** 0.54 * d ** 2.63 / 3.591
    if water_level >= HEIGHT:
        bsize = WIDTH * HEIGHT
        wp = WIDTH + 2.0 * HEIGHT
        manning = (bsize / ROUGH) * math.sqrt(SLOPE) * (bsize / wp) ** (2.0 / 3.0)
        d = math.sqrt(4.0 * WIDTH * HEIGHT / math.pi)
        pressure = 70.0 * SLOPE ** 0.54 * d ** 2.63 / 3.591
        w = (water_level - HEIGHT) / (0.5 * HEIGHT)
        return w * pressure + (1.0 - w) * manning
    if water_level > pond:
        area = WIDTH * water_level
        wp = WIDTH + 2.0 * water_level
        return (area / ROUGH) * math.sqrt(SLOPE) * (area / wp) ** (2.0 / 3.0)
    return 0.0


@pytest.fixture(scope="module")
def setup():
    dem = np.full((3, 3), 10.0)
    soil = SoilFields.uniform(dem.shape, vg_alpha=1.2, vg_n=1.5, vg_he=0.02,
                              theta_s=0.41, theta_r=0.04, k_sat=1e-7)
    grid = Grid.build(dem, 2.0, soil, total_depth=0.3,
                      free_catchment_runoff=False,
                      free_lateral_drainage=False,
                      free_bottom_drainage=False)
    grid = grid.set_culvert(1, 1, roughness=ROUGH, slope=SLOPE,
                            width=WIDTH, height=HEIGHT)
    return grid


@pytest.mark.parametrize("depth", [0.001, 0.3, 1.0, 1.5])  # the four regimes
def test_rating_regimes_match_reference_formulas(setup, depth):
    grid = setup
    params = SolverParameters(culvert_reference_compat=False)
    h = jnp.where(grid.mask, grid.z - 1.0, 0.0)
    h = h.at[0].set(jnp.where(grid.mask[0], grid.z[0] + depth, 0.0))
    k = jnp.where(grid.mask, grid.soil.k_sat, 0.0)
    sink = jnp.zeros_like(h)
    _, rate = W.update_boundary_water(grid, params, h, h, k, sink,
                                      grid.pond_max, jnp.float64(60.0))
    expected = -reference_culvert_flow(depth, float(grid.pond_max[1, 1]))
    assert float(rate[0, 1, 1]) == pytest.approx(expected, rel=1e-12)
    # non-culvert surface nodes carry no boundary flow here
    assert float(jnp.abs(rate[0]).sum()) == pytest.approx(
        abs(expected), rel=1e-12)


def test_reference_compat_uses_head_difference(setup):
    """Gated quirk: water level = 0.5*(H - Hold) - z (water.cpp:760)."""
    grid = setup
    params = SolverParameters()   # culvert_reference_compat=True
    depth = 0.3
    h = jnp.where(grid.mask, grid.z - 1.0, 0.0)
    h = h.at[0].set(jnp.where(grid.mask[0], grid.z[0] + depth, 0.0))
    k = jnp.where(grid.mask, grid.soil.k_sat, 0.0)
    sink = jnp.zeros_like(h)
    _, rate = W.update_boundary_water(grid, params, h, h, k, sink,
                                      grid.pond_max, jnp.float64(60.0))
    # 0.5*(H - H) - z = -z < 0 => no flow, exactly as the reference computes
    assert float(rate[0, 1, 1]) == 0.0


def test_pond_drains_through_culvert(setup):
    grid = setup
    params = SolverParameters(culvert_reference_compat=False)
    water = WaterState.initialize(grid, params, matric_potential=-1.0)
    h0 = water.h.at[0].set(jnp.where(grid.mask[0], grid.z[0] + 0.05, 0.0))
    water = dataclasses.replace(water, h=h0, h_old=h0, best_h=h0)
    water = initialize_balance(grid, params, water)
    storage0 = float(water.balance_prev.storage)

    t = 0.0
    for _ in range(40):
        water, dt = compute_step(grid, params, water, 600.0)
        t += float(dt)
        if t >= 600.0:
            break

    # the culvert removed ponded water and the balance closed
    assert float(water.balance_prev.storage) < storage0 - 1e-4
    assert float(jnp.abs(water.balance_whole.mbe)) < 1e-3 * storage0
    depth_after = float(water.h[0, 1, 1] - grid.z[0, 1, 1])
    assert depth_after < 0.05
    assert int(grid.btype[0, 1, 1]) == BoundaryType.CULVERT
