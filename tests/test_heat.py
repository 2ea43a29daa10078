"""Heat transport tests: material properties, equilibrium, diffusion direction."""

import jax.numpy as jnp
import numpy as np
import pytest

from criteria3d_tpu import Grid, SoilFields, SolverParameters, WaterState
from criteria3d_tpu.constants import ZEROCELSIUS
from criteria3d_tpu.solver import heat as H
from criteria3d_tpu.solver.step import initialize_balance


def make_grid(n=4, depth=1.0):
    dem = np.full((n, n), 100.0)
    soil = SoilFields.uniform((n, n), vg_alpha=1.2, vg_n=1.5, vg_he=0.02,
                              theta_s=0.41, theta_r=0.04, k_sat=5e-6)
    grid = Grid.build(dem, 2.0, soil, total_depth=depth,
                      free_catchment_runoff=False, free_bottom_drainage=False,
                      free_lateral_drainage=False)
    params = SolverParameters()
    water = WaterState.initialize(grid, params, matric_potential=-1.0)
    water = initialize_balance(grid, params, water)
    return grid, params, water


def test_material_properties_plausible():
    grid, params, water = make_grid()
    t = jnp.full(grid.shape, ZEROCELSIUS + 15.0)
    h = jnp.full(grid.shape, -1.0)

    k = H.soil_thermal_conductivity(grid, params, t, h)
    # moist mineral soil: 0.3-2.5 W/m/K
    valid = np.asarray(grid.mask[1:])
    kv = np.asarray(k[1:])[valid]
    assert (kv > 0.2).all() and (kv < 3.0).all()

    cap = H.heat_capacity(grid, params, h, t)
    cv = np.asarray(cap[1:])[valid]
    # ~1-3 MJ/m3/K for moist soil
    assert (cv > 0.5e6).all() and (cv < 4.0e6).all()

    # wetter soil conducts and stores more
    k_wet = H.soil_thermal_conductivity(grid, params, t, jnp.zeros_like(h))
    cap_wet = H.heat_capacity(grid, params, jnp.zeros_like(h), t)
    assert float(k_wet[2, 0, 0]) > float(k[2, 0, 0])
    assert float(cap_wet[2, 0, 0]) > float(cap[2, 0, 0])


def test_soil_relative_humidity():
    # saturated soil: RH ~ 1; very dry soil: RH < 1
    assert float(H.soil_relative_humidity(jnp.float64(0.0), 293.0)) == 1.0
    assert float(H.soil_relative_humidity(jnp.float64(-1000.0), 293.0)) < 0.95


def test_uniform_temperature_is_stationary():
    """No boundary forcing, uniform T: nothing changes."""
    grid, params, water = make_grid()
    t0 = ZEROCELSIUS + 12.0
    heat = H.initialize_heat(grid, t0)
    boundary = H.HeatBoundary.uniform(grid.shape[1:], air_temperature=t0,
                                      net_irradiance=0.0)
    # air at soil temperature, no radiation: sensible flux ~ 0
    heat = H.HeatState(t=heat.t, t_old=heat.t, sink_source=heat.sink_source,
                       storage_prev=H.heat_storage(grid, params, heat, water),
                       storage_whole=heat.storage_whole,
                       sink_whole=heat.sink_whole, mbr=heat.mbr)
    new, mbr = H.heat_step(grid, params, heat, boundary, water, 60.0, 60.0)
    diff = np.abs(np.asarray(new.t[1:] - t0))[np.asarray(grid.mask[1:])]
    assert diff.max() < 1e-6


def test_warm_air_heats_soil_from_top():
    grid, params, water = make_grid(depth=0.5)
    t0 = ZEROCELSIUS + 10.0
    heat = H.initialize_heat(grid, t0)
    heat = H.HeatState(t=heat.t, t_old=heat.t, sink_source=heat.sink_source,
                       storage_prev=H.heat_storage(grid, params, heat, water),
                       storage_whole=heat.storage_whole,
                       sink_whole=heat.sink_whole, mbr=heat.mbr)
    boundary = H.HeatBoundary.uniform(grid.shape[1:],
                                      air_temperature=ZEROCELSIUS + 25.0,
                                      net_irradiance=300.0)
    for _ in range(12):
        heat, mbr = H.heat_step(grid, params, heat, boundary, water, 300.0, 300.0)

    t = np.asarray(heat.t[:, 0, 0])
    # top soil warmed, bottom less so; monotone decay with depth
    assert t[1] > t0 + 0.5
    assert t[1] >= t[-1] - 1e-9
    assert t[-1] < t[1]


def test_advective_link_flux_conserves_and_warms_downstream():
    """Inter-node advection (computeAdvectiveFlux, heat.cpp:606-621):
    downward percolation through a warm-over-cold column carries heat down.
    The pairwise upwind scheme must conserve energy exactly (every link's
    outflow and inflow use the same advected temperature)."""
    import dataclasses

    grid, params, water = make_grid(depth=1.0)
    params = dataclasses.replace(params, heat_advection=True)

    # warm top soil over cold deep soil; near-saturated wet column so the
    # vertical conductances (and hence the liquid fluxes) are significant
    t = jnp.full(grid.shape, ZEROCELSIUS + 5.0)
    t = t.at[1:3].set(ZEROCELSIUS + 20.0)
    heat0 = H.initialize_heat(grid, t)
    heat0 = dataclasses.replace(heat0, t=t, t_old=t)

    # head field with a downward gradient (wetter on top)
    h = grid.z - 0.05
    h = h.at[1:3].add(0.04)
    water_wet = dataclasses.replace(water, h=h, h_old=h)
    from criteria3d_tpu.solver import water as W
    se = W.compute_se(grid, params, h)
    _, k = W.compute_capacity(grid, params, h, h, se)
    water_wet = dataclasses.replace(water_wet, k=k)

    adv_up, adv_down, adv_lat, adv_diag, adv_b = \
        H.advective_link_coefficients(grid, params, heat0, water_wet, h)
    # conservation of the upwind scheme: every link's inflow coupling at
    # one endpoint is the outflow coupling at the other, so the totals
    # match and the 0 degC-reference constants cancel globally
    total_in = float(jnp.sum(adv_up + adv_down + jnp.sum(adv_lat, axis=0)))
    total_out = float(jnp.sum(adv_diag))
    assert total_in > 0.0, "advective coupling should be non-trivial here"
    assert total_in == pytest.approx(total_out, rel=1e-12)
    assert abs(float(jnp.sum(adv_b))) < 1e-9 * total_in * 273.15

    # water percolates downward: layer 3 (first cold layer) receives an
    # inflow coupling from the warm layer above
    up3 = np.asarray(adv_up[3])
    assert up3[np.asarray(grid.mask[3])].mean() > 0.0

    # and a heat_step with advection warms the deep soil faster
    boundary = H.HeatBoundary.uniform(grid.shape[1:],
                                      air_temperature=ZEROCELSIUS + 5.0,
                                      net_irradiance=0.0)

    def run(p):
        heat = dataclasses.replace(
            heat0, storage_prev=H.heat_storage(grid, p, heat0, water_wet))
        for _ in range(6):
            heat, _ = H.heat_step(grid, p, heat, boundary, water_wet,
                                  300.0, 300.0)
        return np.asarray(heat.t)

    t_adv = run(params)
    t_no = run(dataclasses.replace(params, heat_advection=False))
    deep = np.asarray(grid.mask[4])
    assert t_adv[4][deep].mean() > t_no[4][deep].mean()


def test_aerodynamic_conductance_positive_and_wind_dependent():
    b1 = H.HeatBoundary.uniform((4, 4), wind_speed=1.0)
    b2 = H.HeatBoundary.uniform((4, 4), wind_speed=6.0)
    ts = jnp.full((4, 4), ZEROCELSIUS + 15.0)
    k1 = float(H.aerodynamic_conductance(b1, ts)[0, 0])
    k2 = float(H.aerodynamic_conductance(b2, ts)[0, 0])
    assert 0 < k1 < k2
