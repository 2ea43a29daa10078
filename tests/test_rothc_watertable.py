"""RothC and water-table model tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from criteria3d_tpu.physics.rothc import (RothCState, rmf_temperature,
                                          rmf_plant_cover, rothc_monthly_step)
from criteria3d_tpu.physics.watertable import WaterTableModel, weighted_cwb


SHAPE = (4, 4)


def test_rmf_temperature():
    assert float(rmf_temperature(jnp.float64(-10.0))) == 0.0
    r9 = float(rmf_temperature(jnp.float64(9.25)))
    assert r9 == pytest.approx(1.0, abs=0.05)   # ~1 at 9.25 degC (RothC doc)
    assert float(rmf_temperature(jnp.float64(25.0))) > r9


def test_rmf_plant_cover():
    assert float(rmf_plant_cover(jnp.float64(0.0))) == 1.0
    assert float(rmf_plant_cover(jnp.float64(1.0))) == pytest.approx(0.6)


def test_rothc_decay_and_inputs():
    state = RothCState.initialize(SHAPE, soc_total=60.0)
    soc0 = float(state.soc[0, 0])

    # a warm year with no carbon input: SOC declines
    s = state
    for month in range(12):
        s, diag = rothc_monthly_step(s, temp_c=18.0, monthly_bic=-20.0,
                                     clay_pct=25.0, carbon_input=0.0)
    assert float(s.soc[0, 0]) < soc0
    assert float(diag["co2"][0, 0]) > 0.0

    # with strong carbon input the stock grows instead
    s2 = state
    for month in range(12):
        s2, _ = rothc_monthly_step(s2, temp_c=18.0, monthly_bic=-20.0,
                                   clay_pct=25.0, carbon_input=1.0)
    assert float(s2.soc[0, 0]) > float(s.soc[0, 0])

    # pools stay positive
    for pool in (s.dpm, s.rpm, s.bio, s.hum, s.iom):
        assert (np.asarray(pool) >= 0).all()


def test_rothc_cold_freezes_decomposition():
    state = RothCState.initialize(SHAPE, soc_total=60.0)
    new, diag = rothc_monthly_step(state, temp_c=-10.0, monthly_bic=0.0,
                                   clay_pct=25.0)
    assert float(diag["co2"][0, 0]) == 0.0
    assert float(new.soc[0, 0]) == pytest.approx(float(state.soc[0, 0]))


def test_watertable_fit_and_predict():
    """Synthetic well whose depth follows the weighted CWB exactly."""
    rng = np.random.RandomState(0)
    n = 1200
    prec = rng.gamma(0.6, 5.0, n)
    et0 = 2.0 + 1.5 * np.sin(np.arange(n) / 365.0 * 2 * np.pi)

    true_model = WaterTableModel(h0=150.0, alpha=-1.2, nr_days=180)
    true_model.avg_daily_cwb = float(np.mean(prec - et0))

    obs_idx = np.arange(750, 1150, 30)
    obs = np.array([true_model.depth(prec, et0, i) for i in obs_idx])

    fitted = WaterTableModel()
    assert fitted.fit(prec, et0, obs_idx, obs, step_days=10)
    assert fitted.r2 > 0.9
    # recovered parameters close (window quantised by step)
    assert fitted.alpha == pytest.approx(-1.2, rel=0.3)
    pred = fitted.depth(prec, et0, 1100)
    truth = true_model.depth(prec, et0, 1100)
    assert pred == pytest.approx(truth, abs=10.0)   # [cm]


def test_weighted_cwb_insufficient_data():
    prec = np.ones(50)
    et0 = np.ones(50)
    assert weighted_cwb(prec, et0, 40, 90, 0.0) == -9999.0
