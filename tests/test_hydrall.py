"""HYDRALL tests: radiation partition, Farquhar responses, carbon balance."""

import numpy as np
import jax.numpy as jnp
import pytest

from criteria3d_tpu.physics import hydrall as H


def midday_env():
    return dict(lai=4.0, sine_solar_elevation=0.8, direct_irradiance=600.0,
                diffuse_irradiance=150.0, air_temp_c=22.0,
                longwave_irradiance=350.0)


def test_big_leaf_radiation_partition():
    rad = H.big_leaf_radiation(**midday_env())
    lai_sun = float(rad["lai_sunlit"])
    lai_shade = float(rad["lai_shaded"])
    assert 0 < lai_sun < 4.0
    assert lai_sun + lai_shade == pytest.approx(4.0)
    # sunlit leaves absorb more PAR per unit ground than shaded
    assert float(rad["par_sunlit"]) > float(rad["par_shaded"]) > 0
    # night: no absorbed PAR
    night = H.big_leaf_radiation(**{**midday_env(),
                                    "sine_solar_elevation": 0.0})
    assert float(night["par_sunlit"]) == 0.0


def test_leaf_temperature_above_air_in_sun():
    t_sun, t_shade = H.leaf_temperature(22.0, 600.0, 150.0, 1000.0, 66.0, 0.8)
    assert float(t_sun) > float(t_shade)
    assert float(t_shade) > 22.0 + 273.15 - 5.0


def test_farquhar_temperature_response():
    rad = H.big_leaf_radiation(**midday_env())
    common = dict(absorbed_par=float(rad["par_sunlit"]), lai=4.0,
                  kb=float(rad["kb"]), kd_par=float(rad["kd_par"]),
                  pressure_pa=101325.0, last30_t_avg=18.0)
    p15 = H.farquhar_parameters(jnp.float64(288.15), **common)
    p25 = H.farquhar_parameters(jnp.float64(298.15), **common)
    assert float(p25["vcmax"]) > float(p15["vcmax"])   # warmer -> faster
    assert float(p25["kc"]) > float(p15["kc"])
    assert float(p25["gamma_star"]) > float(p15["gamma_star"])
    assert float(p25["j"]) > 0


def test_photosynthesis_responds_to_light_and_stress():
    rad = H.big_leaf_radiation(**midday_env())
    params = H.farquhar_parameters(
        jnp.float64(298.15), absorbed_par=float(rad["par_sunlit"]), lai=4.0,
        kb=float(rad["kb"]), kd_par=float(rad["kd_par"]),
        pressure_pa=101325.0, last30_t_avg=18.0)
    env = dict(co2_pa=40.0, vpd_pa=1000.0, pressure_pa=101325.0,
               air_temp_c=25.0, rni=float(rad["rni_sunlit"]),
               slope_sat_vp=145.0, psychro_pa=66.0)

    ass, gsc, tr = H.photosynthesis_kernel(params, stress=1.0, **env)
    assert 1e-7 < float(ass) < 1e-3     # plausible canopy assimilation
    assert float(tr) > 1e-8
    assert float(gsc) > 1e-5

    # severe water stress cuts conductance and assimilation
    ass_s, gsc_s, tr_s = H.photosynthesis_kernel(params, stress=0.05, **env)
    assert float(gsc_s) < float(gsc)
    assert float(tr_s) < float(tr)
    # assimilation cannot exceed the unstressed value (fixed-point tolerance)
    assert float(ass_s) <= float(ass) * 1.001

    # night (no electron transport): zero assimilation
    night_params = dict(params)
    night_params["j"] = jnp.zeros_like(params["j"])
    ass_n, _, _ = H.photosynthesis_kernel(night_params, **env)
    assert float(ass_n) == 0.0


def test_respiration_scales_with_biomass_and_temperature():
    s1 = H.HydrallPlantState.initialize()
    s2 = H.HydrallPlantState.initialize(foliage=0.4, sapwood=12.0, root=0.8)
    r1 = float(H.plant_respiration(s1, 15.0, 1.0))
    r2 = float(H.plant_respiration(s2, 15.0, 1.0))
    assert r2 > r1 > 0
    r_cold = float(H.plant_respiration(s1, 2.0, 1.0))
    assert r_cold < r1


def test_annual_growth_allocation():
    state = H.HydrallPlantState.initialize()
    import dataclasses
    state = dataclasses.replace(state, npp_year=jnp.asarray(0.5))  # [kg C m-2]
    new, litter = H.annual_growth(state, yearly_prec=800.0, yearly_et0=900.0)
    assert float(litter) > 0
    # NPP was allocated: total biomass grows despite turnover
    total0 = 0.2 + 6.0 + 0.4
    total1 = float(new.biomass_foliage + new.biomass_sapwood + new.biomass_root)
    assert total1 > total0 * 0.8
    assert float(new.npp_year) == 0.0
    # drier climate -> more allocation to roots
    dry, _ = H.annual_growth(state, yearly_prec=300.0, yearly_et0=1000.0)
    wet, _ = H.annual_growth(state, yearly_prec=1000.0, yearly_et0=800.0)
    assert float(dry.biomass_root) > float(wet.biomass_root)
