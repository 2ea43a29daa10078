"""Downy mildew model: seasonal behaviour and infection triggering."""

import numpy as np
import jax.numpy as jnp
import pytest

from criteria3d_tpu.physics.downy_mildew import (DownyMildewInput,
                                                DownyMildewState,
                                                dormancy_breaking,
                                                downy_mildew_step,
                                                hydrothermal_time)


def make_input(t=18.0, rain=0.0, wet=0, rh=70.0, shape=()):
    f = lambda v: jnp.full(shape, float(v), jnp.float32)
    return DownyMildewInput(tair=f(t), rain=f(rain), leaf_wetness=f(wet),
                            relative_humidity=f(rh))


def test_hydrothermal_time_properties():
    assert float(hydrothermal_time(jnp.float32(-2.0), 1.0)) == 0.0
    # warmer (within range) -> faster accumulation
    assert float(hydrothermal_time(jnp.float32(20.0), 1.0)) > \
        float(hydrothermal_time(jnp.float32(5.0), 1.0))
    # dry litter -> zero
    assert float(hydrothermal_time(jnp.float32(20.0), 0.0)) == 0.0


def test_dormancy_breaking_monotone():
    h = np.linspace(0, 10, 20)
    d = np.asarray(dormancy_breaking(jnp.asarray(h)))
    assert (np.diff(d) >= 0).all()
    assert d[0] < 0.01 and d[-1] > 0.95


def test_infection_cycle():
    """Warm wet spring: oospores mature, germinate with rain, release
    zoospores in wet conditions, infect leaves and show oil spots."""
    state = DownyMildewState.initialize()
    infected = False
    oil = 0.0
    for hour in range(24 * 60):  # two months of warm wet weather
        rain = 1.0 if hour % 6 == 0 else 0.0
        inp = make_input(t=20.0, rain=rain, wet=1, rh=95.0)
        state, out = downy_mildew_step(state, inp,
                                       is_first_january=(hour == 0))
        infected = infected or bool(out["is_infection"])
        oil = max(oil, float(out["oil_spots"]))
    assert float(state.htt) > 1.3          # hydrothermal time advanced
    assert infected                         # an infection event occurred
    assert oil > 0.0                        # symptoms eventually appeared


def test_no_infection_when_dry():
    state = DownyMildewState.initialize()
    infected = False
    for hour in range(24 * 30):
        inp = make_input(t=22.0, rain=0.0, wet=0, rh=40.0)
        state, out = downy_mildew_step(state, inp,
                                       is_first_january=(hour == 0))
        infected = infected or bool(out["is_infection"])
    assert not infected
    # dry litter: hydrothermal time barely moves
    assert float(state.htt) < 0.5


def test_vectorized_over_map():
    state = DownyMildewState.initialize((3, 3))
    inp = make_input(t=20.0, rain=1.0, wet=1, rh=95.0, shape=(3, 3))
    state, out = downy_mildew_step(state, inp, is_first_january=True)
    assert out["infection_rate"].shape == (3, 3)
    assert state.stage.shape == (3, 3, 16)


# ---------------------------------------------------------------------------
# powdery mildew
# ---------------------------------------------------------------------------

def test_powdery_mildew_season():
    from criteria3d_tpu.physics.powdery_mildew import (PowderyMildewState,
                                                       powdery_mildew_step)
    state = PowderyMildewState.initialize()
    any_infection = False
    risk_max = 0.0
    for day in range(120):
        rain = 5.0 if day % 7 == 0 else 0.0
        state, out = powdery_mildew_step(
            state, tavg=18.0, rain=rain, leaf_wetness=8.0,
            relative_humidity=80.0, is_bud_break=(day == 0))
        any_infection = any_infection or bool(out["day_infection"])
        risk_max = max(risk_max, float(out["infection_risk"]))
    assert float(state.degree_days) == pytest.approx(120 * 8.0)
    assert any_infection
    assert risk_max > 0.0
    assert float(state.total_sporulating) > 0.0


def test_powdery_mildew_cold_inactive():
    from criteria3d_tpu.physics.powdery_mildew import (PowderyMildewState,
                                                       powdery_mildew_step)
    state = PowderyMildewState.initialize()
    for day in range(30):
        state, out = powdery_mildew_step(
            state, tavg=2.0, rain=5.0, leaf_wetness=8.0,
            relative_humidity=90.0, is_bud_break=(day == 0))
        assert float(out["col"]) == 0.0    # too cold: no infection
    assert float(state.degree_days) == 0.0
