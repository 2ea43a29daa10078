"""Checkpoint/resume roundtrip tests (WP_<depth> raster scheme)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from criteria3d_tpu import Grid, SoilFields, SolverParameters, WaterState, compute_step
from criteria3d_tpu.io.esri import RasterHeader, read_flt, write_flt, read_asc, write_asc
from criteria3d_tpu.io.state_io import load_state, save_state, state_dir_name
from criteria3d_tpu.physics.snow import SnowState
from criteria3d_tpu.solver.step import initialize_balance
from tests.test_catchment3d import valley_dem


def test_esri_flt_roundtrip(tmp_path):
    hdr = RasterHeader(nrows=5, ncols=7, xllcorner=1000.0, yllcorner=2000.0,
                       cellsize=25.0)
    data = np.arange(35, dtype=float).reshape(5, 7)
    write_flt(str(tmp_path / "test"), data, hdr)
    back, hdr2 = read_flt(str(tmp_path / "test"))
    np.testing.assert_allclose(back, data)
    assert hdr2.cellsize == 25.0 and hdr2.nrows == 5
    # cell centre coordinates (row 0 = north)
    x, y = hdr2.xy(0, 0)
    assert x == 1000.0 + 12.5 and y == 2000.0 + 5 * 25.0 - 12.5


def test_esri_asc_roundtrip(tmp_path):
    hdr = RasterHeader(nrows=3, ncols=4, xllcorner=0, yllcorner=0, cellsize=10)
    data = np.random.RandomState(0).rand(3, 4)
    write_asc(str(tmp_path / "t.asc"), data, hdr)
    back, hdr2 = read_asc(str(tmp_path / "t.asc"))
    np.testing.assert_allclose(back, data, rtol=1e-5)


def test_state_roundtrip(tmp_path):
    dem = valley_dem(8)
    soil = SoilFields.uniform(dem.shape, vg_alpha=1.2, vg_n=1.5, vg_he=0.02,
                              theta_s=0.41, theta_r=0.04, k_sat=5e-6)
    grid = Grid.build(dem, 10.0, soil, total_depth=0.5)
    params = SolverParameters()
    state = WaterState.initialize(grid, params, matric_potential=-1.2)
    state = initialize_balance(grid, params, state)
    # perturb: one step of drainage so the profile is non-trivial
    state, _ = compute_step(grid, params, state, 600.0)

    snow = SnowState.zero(grid.shape[1:], surface_temp=-1.0)
    dd = jnp.full(grid.shape[1:], 432.1)
    lai = jnp.full(grid.shape[1:], 1.7)

    path = str(tmp_path / state_dir_name(2023, 5, 10, 13))
    save_state(path, grid, state, snow=snow, degree_days=dd, lai=lai)
    assert os.path.exists(os.path.join(path, "WP_0.flt"))

    water2, snow2, extras = load_state(path, grid, params)

    # matric potential preserved to float32 raster precision
    psi1 = np.asarray(state.matric_potential(grid))
    psi2 = np.asarray(water2.matric_potential(grid))
    mask = np.asarray(grid.mask)
    np.testing.assert_allclose(psi2[mask], psi1[mask], atol=1e-5)

    np.testing.assert_allclose(np.asarray(snow2.surface_temp),
                               np.asarray(snow.surface_temp), atol=1e-5)
    np.testing.assert_allclose(float(extras["degreeDays"][0, 0]), 432.1,
                               atol=1e-4)

    # the resumed state can step immediately
    w3, dt = compute_step(grid, params, water2, 600.0)
    assert float(dt) > 0


def test_inhour_restart_matches_uninterrupted(tmp_path):
    """VERDICT r2 item 9: resume a mid-hour checkpoint and reproduce the
    uninterrupted hour (reference isRestart / currentSeconds path)."""
    import dataclasses

    import jax.numpy as jnp

    from criteria3d_tpu import (Grid, SoilFields, SolverParameters,
                                WaterState)
    from criteria3d_tpu.io.state_io import (load_inhour_state,
                                            save_inhour_state)
    from criteria3d_tpu.solver.step import (compute_period_stats,
                                            compute_step,
                                            initialize_balance)

    n = 12
    rows, cols = np.mgrid[0:n, 0:n]
    dem = 80.0 + (n - 1 - rows) * 0.4 + np.abs(cols - n // 2) * 0.3
    soil = SoilFields.uniform(dem.shape, vg_alpha=1.2, vg_n=1.5, vg_he=0.02,
                              theta_s=0.41, theta_r=0.04, k_sat=5e-6)
    grid = Grid.build(dem, 10.0, soil, total_depth=0.5)
    params = SolverParameters()
    state0 = WaterState.initialize(grid, params, matric_potential=-1.0)
    state0 = initialize_balance(grid, params, state0)
    rain = 0.015 * float(grid.area) / 3600.0
    sink = jnp.zeros_like(state0.sink_source).at[0].set(
        jnp.where(grid.mask[0], rain, 0.0))
    state0 = dataclasses.replace(state0, sink_source=sink)

    # uninterrupted hour
    full, _ = compute_period_stats(grid, params, state0, 3600.0)

    # interrupted: step until past the half hour, checkpoint, reload, resume
    st, t = state0, 0.0
    # the period-entry reset of the sink counter, as compute_period does
    bp = st.balance_period
    st = dataclasses.replace(
        st, balance_period=dataclasses.replace(
            bp, sink_source=jnp.zeros((), jnp.float64)))
    while t < 1800.0:
        st, dt = compute_step(grid, params, st, 3600.0 - t)
        t += float(dt)
    ckpt = str(tmp_path / "inhour")
    save_inhour_state(ckpt, st, t)

    st2, elapsed = load_inhour_state(ckpt)
    assert elapsed == t
    st2 = dataclasses.replace(st2, sink_source=sink)   # caller re-applies
    resumed, _ = compute_period_stats(grid, params, st2, 3600.0,
                                      start_seconds=elapsed)

    np.testing.assert_allclose(np.asarray(resumed.h), np.asarray(full.h),
                               rtol=0, atol=1e-12)
    assert float(resumed.balance_period.sink_source) == pytest.approx(
        float(full.balance_period.sink_source), rel=1e-12)
    assert float(resumed.balance_whole.mbr) == pytest.approx(
        float(full.balance_whole.mbr), abs=1e-12)
    assert float(resumed.dt_curr) == float(full.dt_curr)
