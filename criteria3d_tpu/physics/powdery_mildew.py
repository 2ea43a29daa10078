"""Grapevine powdery mildew (Erysiphe necator) — VINE3D disease model.

Vectorised re-implementation of src/grapevine/powderyMildew.cpp (Costantini
2013; Caffi/Rossi-type model): degree-day driven ascospore maturation,
rain-triggered discharge onto leaves, temperature/VPD-dependent infection
and colony latency. Daily step; arrays of any shape.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from criteria3d_tpu.physics.downy_mildew import vapour_pressure_deficit

__all__ = ["PowderyMildewState", "powdery_mildew_step"]

# model constants (powderyMildew.cpp:23-31)
DELTA = 0.969
LAMBDA = 0.0004
FI = 7.391
NU = 2.403
CSI = 0.892
UPSILON = 0.221
GAMMA = 44.7
PSI = 0.067
THETA = 3.244


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PowderyMildewState:
    degree_days: jax.Array
    aic: jax.Array                    # ascospores in chasmothecia (mature pool)
    current_colonies: jax.Array
    total_sporulating: jax.Array

    @staticmethod
    def initialize(shape=(), dtype=jnp.float32) -> "PowderyMildewState":
        z = lambda v: jnp.full(shape, v, dtype)
        return PowderyMildewState(
            degree_days=z(0.0),
            aic=z(float(ascospores_ready_fraction(0.0))),
            current_colonies=z(0.0), total_sporulating=z(0.0))


def compute_degree_day(t):
    """Base-10 degree day (powderyMildew.cpp:116-122)."""
    return jnp.maximum(t - 10.0, 0.0)


def ascospores_ready_fraction(degree_day):
    """(powderyMildew.cpp:141-145)."""
    return jnp.exp(-1.95 * jnp.exp(-1.91 * jnp.asarray(degree_day) / 100.0))


def ascospore_discharge_rate(t, rain, leaf_wetness):
    """(powderyMildew.cpp:164-172)."""
    rate = 1.0 - DELTA * jnp.exp(-LAMBDA * t ** 2 * leaf_wetness)
    return jnp.where((rain < 2) | (t < 4) | (t > 30), 0.0, rate)


def infection_rate(t, vpd):
    """(powderyMildew.cpp:191-203)."""
    teq = jnp.clip((t - 5.0) / 26.0, 1e-6, 1.0 - 1e-6)
    rate = (FI * teq ** NU * (1.0 - teq)) ** CSI * jnp.exp(-UPSILON * vpd)
    return jnp.where((t < 5) | (t > 31), 0.0, rate)


def latency_progress(t):
    """(powderyMildew.cpp:221-225)."""
    return 1.0 / (GAMMA + PSI * t ** 2 - THETA * t)


def powdery_mildew_step(state: PowderyMildewState, *, tavg, rain,
                        leaf_wetness, relative_humidity,
                        is_bud_break=False):
    """One daily step (powderyMildew (powderyMildew.cpp:34-97)).

    Returns (new_state, outputs dict with aol/col/infection_rate/
    infection_risk/day_infection/day_sporulation).
    """
    if is_bud_break:
        state = PowderyMildewState.initialize(jnp.shape(state.degree_days),
                                              state.degree_days.dtype)

    tavg = jnp.asarray(tavg, state.degree_days.dtype)
    dd_inc = compute_degree_day(tavg)
    vpd = vapour_pressure_deficit(tavg, relative_humidity)

    aic = state.aic + (ascospores_ready_fraction(state.degree_days + dd_inc)
                       - ascospores_ready_fraction(state.degree_days))

    inf_rate = infection_rate(tavg, vpd)
    infection_risk = inf_rate * aic

    aol = aic * ascospore_discharge_rate(tavg, rain, leaf_wetness)
    aic = aic - aol
    col = aol * inf_rate

    latency = latency_progress(tavg)
    daily_sporulating = state.current_colonies * latency
    total_sporulating = state.total_sporulating + daily_sporulating
    current_colonies = state.current_colonies + col - daily_sporulating

    new_state = PowderyMildewState(
        degree_days=state.degree_days + dd_inc, aic=aic,
        current_colonies=current_colonies,
        total_sporulating=total_sporulating)
    outputs = dict(aol=aol, col=col, infection_rate=inf_rate,
                   infection_risk=infection_risk,
                   day_infection=col > 0.001,
                   day_sporulation=daily_sporulating > 0.001)
    return new_state, outputs
