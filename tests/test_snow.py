"""Snow (Brooks) model tests: partitioning, accumulation, melt, energy sanity."""

import jax.numpy as jnp
import numpy as np
import pytest

from criteria3d_tpu.constants import NODATA
from criteria3d_tpu.physics.snow import (SnowForcing, SnowParameters,
                                         SnowState, dew_point_from_rh,
                                         aerodynamic_resistance_campbell77,
                                         snow_step)

SHAPE = (4, 4)


def forcing(air_t, prec, rad=0.0, wind=2.0, rh=80.0, trans=0.5, sw=0.0):
    f = lambda v: jnp.full(SHAPE, v, jnp.float64)
    return SnowForcing(air_temp=f(air_t), precipitation=f(prec),
                       rel_humidity=f(rh), wind_speed=f(wind),
                       global_radiation=f(rad), beam_radiation=f(rad * 0.7),
                       transmissivity=f(trans),
                       clear_sky_transmissivity=f(0.75),
                       surface_water=f(sw))


def test_dew_point():
    # at 100% RH the dew point equals the temperature
    assert float(dew_point_from_rh(jnp.float64(100.0), jnp.float64(10.0))) == \
        pytest.approx(10.0, abs=1e-6)
    assert float(dew_point_from_rh(jnp.float64(50.0), jnp.float64(10.0))) < 10.0


def test_aerodynamic_resistance_decreases_with_wind():
    r1 = float(aerodynamic_resistance_campbell77(True, 10.0, jnp.float64(1.0), 1.0))
    r2 = float(aerodynamic_resistance_campbell77(True, 10.0, jnp.float64(5.0), 1.0))
    assert r1 > r2 > 0


def test_cold_snowfall_accumulates():
    state = SnowState.zero(SHAPE, surface_temp=-3.0)
    for _ in range(6):
        state, out = snow_step(state, forcing(air_t=-5.0, prec=2.0))
    assert float(state.swe[0, 0]) > 8.0          # most of 12 mm accumulated
    assert float(out["rain"][0, 0]) == 0.0       # all snow below -0.5 degC
    assert float(state.age[0, 0]) != NODATA


def test_warm_rain_no_snow():
    state = SnowState.zero(SHAPE, surface_temp=5.0)
    state, out = snow_step(state, forcing(air_t=10.0, prec=5.0))
    assert float(state.swe[0, 0]) == 0.0
    assert float(out["rain"][0, 0]) == pytest.approx(5.0)
    assert float(out["snow_fall"][0, 0]) == 0.0


def test_mixed_precipitation_partition():
    state = SnowState.zero(SHAPE, surface_temp=0.0)
    _, out = snow_step(state, forcing(air_t=0.75, prec=4.0))
    # linear partition between -0.5 and +2 degC (snow.cpp:121-140)
    frac_rain = (0.75 - (-0.5)) / (2.0 - (-0.5))
    assert float(out["rain"][0, 0]) == pytest.approx(4.0 * frac_rain, rel=1e-12)
    assert float(out["snow_fall"][0, 0]) == pytest.approx(4.0 * (1 - frac_rain), rel=1e-12)


def test_warm_sunny_melt():
    # build a snowpack, then melt it with warm sunny weather
    state = SnowState.zero(SHAPE, surface_temp=-5.0)
    for _ in range(12):
        state, _ = snow_step(state, forcing(air_t=-4.0, prec=3.0))
    swe_peak = float(state.swe[0, 0])
    assert swe_peak > 20.0

    melted = 0.0
    for _ in range(48):
        state, out = snow_step(state, forcing(air_t=8.0, prec=0.0, rad=500.0))
        melted += float(out["snow_melt"][0, 0])
    assert float(state.swe[0, 0]) < swe_peak * 0.5
    assert melted > 0.0  # melt water was produced for the water model


def test_albedo_ages():
    state = SnowState.zero(SHAPE, surface_temp=-3.0)
    state, _ = snow_step(state, forcing(air_t=-5.0, prec=5.0))
    age_new = float(state.age[0, 0])
    assert age_new == pytest.approx(0.0)
    for _ in range(24):
        state, _ = snow_step(state, forcing(air_t=-5.0, prec=0.0))
    assert float(state.age[0, 0]) == pytest.approx(1.0, abs=0.05)


def test_free_water_skip():
    """Cells with >100 mm free surface water never hold a snowpack; the
    whole precipitation passes through as rain (snow.cpp:168-190)."""
    state = SnowState.zero(SHAPE)
    sw = jnp.zeros(SHAPE).at[1, 1].set(150.0).at[2, 2].set(50.0)
    f = forcing(air_t=-5.0, prec=3.0, sw=sw)
    s, out = snow_step(state, f)
    for _ in range(5):
        s, out = snow_step(s, f)
    swe = np.asarray(s.swe)
    assert swe[1, 1] == 0.0                      # river cell: no pack
    assert swe[0, 0] > 5.0 and swe[2, 2] > 5.0   # dry + mildly ponded: snow
    assert float(out["rain"][1, 1]) == pytest.approx(3.0)   # passthrough
    assert float(out["snow_fall"][1, 1]) == 0.0
    assert float(s.age[1, 1]) == NODATA
