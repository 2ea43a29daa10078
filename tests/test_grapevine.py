"""Grapevine phenology/growth tests: a full synthetic season."""

import numpy as np
import jax.numpy as jnp
import pytest

from criteria3d_tpu.physics.grapevine import (GrapevineParameters,
                                              GrapevineState, Stage,
                                              fruit_biomass_step,
                                              lai_vine_daily,
                                              phenology_daily_step,
                                              tartaric_acid,
                                              update_thermal_sum)


def synthetic_temperature(doy):
    """Po valley-ish annual cycle [degC]."""
    return 13.0 + 11.0 * np.sin((doy - 105) / 365.0 * 2 * np.pi)


def run_season(n_days=360):
    params = GrapevineParameters()
    state = GrapevineState.initialize()
    stages = {}
    # start 1 September (doy 244); one UB-free season (DEVIATIONS #26)
    for i in range(n_days):
        doy = (244 + i - 1) % 365 + 1
        t = synthetic_temperature(doy)
        after_march = 60 <= doy  # Mar 1 onward (non-leap doy 60)
        state = update_thermal_sum(state, t, after_march)
        state = phenology_daily_step(state, params, t, doy)
        state = lai_vine_daily(state, params, t, doy)
        if state.stage >= Stage.FRUIT_SET:
            state = fruit_biomass_step(state, params, net_assimilation_g=2.0)
        stages[i] = float(state.stage)
    return params, state, stages


def test_phenology_progression():
    params, state, stages = run_season()
    s = np.array([stages[i] for i in sorted(stages)])
    # chilling accumulates over winter, bud burst in spring
    assert s[0] < 2.0
    assert s.max() >= Stage.VERAISON          # reached ripening
    # stage never decreases within the vegetative season (after the
    # 15 November reset at day 75, before any second-autumn restart)
    veg = s[80:]
    assert (np.diff(veg) >= -1e-9).all()


def test_lai_seasonal_cycle():
    params, state, _ = run_season()
    # after a full season the vine went through growth; LAI is bounded
    assert params.lai_min <= float(state.lai) <= params.lai_max


def test_fruit_biomass_accumulates():
    params, state, _ = run_season()
    assert float(state.fruit_biomass) > 0.0
    assert float(state.cumulated_biomass) >= float(state.fruit_biomass) * 0.5


def test_tartaric_acid_declines_with_ripening():
    params = GrapevineParameters()
    import dataclasses
    s1 = dataclasses.replace(GrapevineState.initialize(),
                             stage=jnp.asarray(Stage.VERAISON + 0.1))
    s2 = dataclasses.replace(GrapevineState.initialize(),
                             stage=jnp.asarray(Stage.VERAISON + 0.9))
    t1 = float(tartaric_acid(s1))
    t2 = float(tartaric_acid(s2))
    assert t1 > t2 > 0          # acidity drops as berries grow
    s0 = GrapevineState.initialize()
    assert np.isnan(float(tartaric_acid(s0)))
