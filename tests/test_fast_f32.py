"""Mixed-precision fast mode: f64 assembly/state + f32 conductance math and
psi-form Jacobi sweeps.

The reference is FP64 throughout. The fast mode's accuracy contract:

* on a LOCKED time-step trajectory (fixed dt), heads match the f64 path to
  well under a millimetre after an hour of infiltration — i.e. the f32 math
  introduces no per-step precision loss that survives the MBR gate;
* free-running (adaptive dt), the two paths may pick different accept/grow
  decisions near thresholds, so heads can differ by the scheme's own
  inter-trajectory discretization spread (measured ~5 cm max between two
  *pure-f64* runs with different dt caps on this problem); the integral
  quantities — total storage and whole-period MBR — still agree tightly.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from criteria3d_tpu import (Grid, SoilFields, SolverParameters, WaterState,
                            compute_period)
from criteria3d_tpu.solver import water as W
from criteria3d_tpu.solver.step import initialize_balance
from tests.test_catchment3d import valley_dem


def build(params):
    dem = valley_dem(10)
    soil = SoilFields.uniform(dem.shape, vg_alpha=1.2, vg_n=1.5, vg_he=0.02,
                              theta_s=0.41, theta_r=0.04, k_sat=5e-6)
    grid = Grid.build(dem, 10.0, soil, total_depth=0.6)
    state = WaterState.initialize(grid, params, matric_potential=-1.5)
    state = initialize_balance(grid, params, state)
    rain = 0.015 * float(grid.area) / 3600.0
    sink = jnp.zeros_like(state.sink_source)
    sink = sink.at[0].set(jnp.where(grid.mask[0], rain, 0.0))
    return grid, dataclasses.replace(state, sink_source=sink)


def test_fast_sweep_matches_f64_heads_on_locked_trajectory():
    """Fixed dt = 60 s: both paths take the same 60 steps, heads agree <1mm."""
    p64 = SolverParameters(delta_t_min=60.0, delta_t_max=60.0)
    p32 = SolverParameters.fast_f32(delta_t_min=60.0, delta_t_max=60.0)
    assert p32.sweep_dtype == jnp.float32

    g64, s64 = build(p64)
    g32, s32 = build(p32)
    assert s32.h.dtype == jnp.float64   # state stays f64; only sweeps are f32

    out64 = compute_period(g64, p64, s64, 3600.0)
    out32 = compute_period(g32, p32, s32, 3600.0)

    psi64 = np.asarray(out64.matric_potential(g64))
    psi32 = np.asarray(out32.matric_potential(g32))
    mask = np.asarray(g64.mask)
    err = np.abs(psi64 - psi32)[mask]
    assert err.max() < 1e-3, f"max psi error {err.max():.2e} m"


def test_fast_free_running_matches_f64_hydrology():
    """Adaptive dt: integral quantities agree; heads within the scheme's own
    inter-trajectory spread (the f64 path itself differs by ~5 cm max between
    different valid dt sequences on this problem)."""
    p64 = SolverParameters()
    p32 = SolverParameters.fast_f32()

    g64, s64 = build(p64)
    g32, s32 = build(p32)

    out64 = compute_period(g64, p64, s64, 3600.0)
    out32 = compute_period(g32, p32, s32, 3600.0)

    # the fast run still closes mass under the reference gate
    assert abs(float(out32.balance_whole.mbr)) < 2e-3
    s_64 = float(W.total_water_content(g64, p64, out64.h, out64.se))
    s_32 = float(W.total_water_content(g32, p32, out32.h, out32.se))
    assert s_32 == pytest.approx(s_64, rel=1e-4)

    psi64 = np.asarray(out64.matric_potential(g64))
    psi32 = np.asarray(out32.matric_potential(g32))
    mask = np.asarray(g64.mask)
    err = np.abs(psi64 - psi32)[mask]
    assert err.max() < 0.1, f"max psi error {err.max():.2e} m"
    assert np.median(err) < 1e-2, f"median psi error {np.median(err):.2e} m"
