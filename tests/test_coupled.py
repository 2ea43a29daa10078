"""Coupled water+heat stepping (BASELINE config 4 mini)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from criteria3d_tpu import Grid, SoilFields, SolverParameters, WaterState
from criteria3d_tpu.constants import ZEROCELSIUS
from criteria3d_tpu.solver import heat as H
from criteria3d_tpu.solver.coupled import compute_step_coupled
from criteria3d_tpu.solver.step import initialize_balance


@pytest.fixture(scope="module")
def setup():
    dem = np.full((4, 4), 100.0)
    soil = SoilFields.uniform(dem.shape, vg_alpha=1.2, vg_n=1.5, vg_he=0.02,
                              theta_s=0.41, theta_r=0.04, k_sat=5e-6)
    grid = Grid.build(dem, 2.0, soil, total_depth=0.5,
                      free_catchment_runoff=False)
    params = SolverParameters()
    water = WaterState.initialize(grid, params, matric_potential=-1.0)
    water = initialize_balance(grid, params, water)
    return grid, params, water


def test_coupled_step_advances_both_fields(setup):
    grid, params, water = setup
    t0 = ZEROCELSIUS + 10.0
    heat = H.initialize_heat(grid, t0)
    heat = dataclasses.replace(
        heat, storage_prev=H.heat_storage(grid, params, heat, water))
    boundary = H.HeatBoundary.uniform(grid.shape[1:],
                                      air_temperature=ZEROCELSIUS + 25.0,
                                      net_irradiance=400.0)
    rain = 0.005 * float(grid.area) / 3600.0
    water = dataclasses.replace(
        water, sink_source=jnp.zeros_like(water.sink_source).at[0].set(
            jnp.where(grid.mask[0], rain, 0.0)))

    w, h, dt = water, heat, 0.0
    t = 0.0
    for _ in range(6):
        w, h, dt = compute_step_coupled(grid, params, w, h, boundary,
                                        3600.0 - t)
        t += float(dt)
        if t >= 3600.0:
            break

    # water moved (rain infiltrated)
    assert float(jnp.max(w.se[1])) > float(jnp.max(water.se[1]))
    # soil warmed from the hot boundary
    mask1 = np.asarray(grid.mask[1])
    t_new = np.asarray(h.t[1])[mask1]
    assert (t_new > t0 + 0.1).all()
    # temperature stays physical
    assert (t_new < ZEROCELSIUS + 60.0).all()
    assert np.isfinite(np.asarray(h.t)[np.asarray(grid.mask)]).all()


def test_fast_f32_heat_matches_f64():
    """The f32 heat fast path (assembly + sweeps in the sweep dtype,
    balance in f64 — heat_step fast mode) tracks the f64 path to the
    millikelvin level over an hour, conduction and vapor alike."""
    import dataclasses

    import numpy as np

    from criteria3d_tpu import (Grid, SoilFields, SolverParameters,
                                WaterState)
    from criteria3d_tpu.core.grid import BoundaryType
    from criteria3d_tpu.solver import heat as H
    from criteria3d_tpu.solver.coupled import compute_period_coupled
    from criteria3d_tpu.solver.step import initialize_balance

    def setup(params):
        dem = np.zeros((6, 6)) + np.arange(6)[None, :] * 0.1
        soil = SoilFields.uniform((6, 6), vg_alpha=1.4, vg_n=1.6,
                                  vg_he=0.02, theta_s=0.43, theta_r=0.05,
                                  k_sat=1e-5)
        grid = Grid.build(dem, 2.0, soil, total_depth=0.6,
                          free_catchment_runoff=False,
                          free_bottom_drainage=False,
                          free_lateral_drainage=False)
        bt = np.asarray(grid.btype).copy()
        bs = np.asarray(grid.bsize).copy()
        bt[1][:] = int(BoundaryType.HEAT_SURFACE)
        bs[1][:] = float(grid.area)
        grid = dataclasses.replace(grid, btype=jnp.asarray(bt),
                                   bsize=jnp.asarray(bs))
        water = WaterState.initialize(grid, params, matric_potential=-2.0)
        water = initialize_balance(grid, params, water)
        heat = H.initialize_heat(grid, 283.15)
        heat = dataclasses.replace(
            heat, storage_prev=H.heat_storage(grid, params, heat, water),
            storage_whole=H.heat_storage(grid, params, heat, water))
        boundary = H.HeatBoundary.uniform(
            grid.shape[1:], air_temperature=298.15, rel_humidity=50.0,
            wind_speed=2.0, net_irradiance=300.0,
            mask=jnp.asarray(np.asarray(grid.btype[1])
                             == int(BoundaryType.HEAT_SURFACE)))
        return grid, water, heat, boundary

    for vapor in (False, True):
        p64 = SolverParameters(heat_vapor=vapor)
        pf = SolverParameters.fast_f32(heat_vapor=vapor)
        g, w, h, b = setup(p64)
        w64, h64 = compute_period_coupled(g, p64, w, h, b, 3600.0)
        g, w, h, b = setup(pf)
        wf, hf = compute_period_coupled(g, pf, w, h, b, 3600.0)
        dT = float(jnp.max(jnp.abs(h64.t - hf.t)))
        dH = float(jnp.max(jnp.abs(w64.h - wf.h)))
        assert np.isfinite(dT) and dT < 0.05, (vapor, dT)
        assert dH < 1e-3, (vapor, dH)
        assert np.isfinite(float(hf.mbr))


def test_frozen_props_envelope():
    """heat_frozen_props (DEVIATIONS #31, the bench coupled-leg default)
    must track the exact-per-substep fast path within its documented
    envelope on the heat-parity column forcing (warm air + 300 W/m2 over
    cool soil, vapor on): measured ~78 mK over 3 h (~26 mK/h; the fast
    path itself sits ~3 mK/h from f64). A catastrophic-regression guard,
    not a parity bar — the solve/balance restructure behind the flag has
    already produced a +13 K runaway once (dt-dependent correction term
    divided by the halved sub-step length) which this test would catch
    in its first hour."""
    from criteria3d_tpu.solver.coupled import compute_period_coupled

    def run(frozen):
        dem = np.zeros((1, 1))
        soil = SoilFields.uniform((1, 1), vg_alpha=1.4, vg_n=1.6,
                                  vg_he=0.02, theta_s=0.43, theta_r=0.05,
                                  k_sat=1e-5)
        grid = Grid.build(dem, 2.0, soil, total_depth=0.8,
                          free_catchment_runoff=False,
                          free_bottom_drainage=False,
                          free_lateral_drainage=False)
        grid = dataclasses.replace(
            grid,
            btype=grid.btype.at[1, 0, 0].set(8),   # HeatSurface
            bsize=grid.bsize.at[1, 0, 0].set(float(grid.area)))
        params = SolverParameters.fast_f32(heat_vapor=True,
                                           heat_frozen_props=frozen)
        water = WaterState.initialize(grid, params, matric_potential=-2.0)
        water = initialize_balance(grid, params, water)
        heat = H.initialize_heat(grid, 283.15)
        heat = dataclasses.replace(
            heat, storage_prev=H.heat_storage(grid, params, heat, water),
            storage_whole=H.heat_storage(grid, params, heat, water))
        boundary = H.HeatBoundary.uniform(
            grid.shape[1:], air_temperature=298.15, rel_humidity=50.0,
            wind_speed=2.0, net_irradiance=300.0, mask=grid.mask[1])
        for _ in range(3):
            water, heat = compute_period_coupled(grid, params, water, heat,
                                                 boundary, 3600.0)
        return np.asarray(heat.t), grid

    t_exact, grid = run(False)
    t_frozen, _ = run(True)
    mask = np.array(grid.mask)
    mask[0] = False
    err_mk = 1000.0 * np.abs(t_frozen - t_exact)[mask].max()
    assert err_mk < 150.0, f"frozen-props envelope blown: {err_mk:.1f} mK"
    # and the trajectory actually warmed toward the forcing on both paths
    assert t_exact[mask].max() > 283.15 + 5.0
