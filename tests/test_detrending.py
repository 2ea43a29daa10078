"""Tests for multiple/local/glocal detrending, Shepard, topo distance, kriging."""

import jax.numpy as jnp
import numpy as np
import pytest

from criteria3d_tpu.constants import NODATA
from criteria3d_tpu.physics import fitting, kriging
from criteria3d_tpu.physics.detrending import (
    DetrendingOptions, cross_validation_error, glocal_detrending_map,
    glocal_weight_maps, local_detrending_map, loo_residuals,
    multiple_detrending, optimize_topo_kh, retrend_map,
    topographic_distance, topographic_distance_matrix)
from criteria3d_tpu.physics.interpolation import shepard_idw_map


def _stations(n=30, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 50_000, n)
    y = rng.uniform(0, 50_000, n)
    z = rng.uniform(0, 2000, n)
    return x, y, z, rng


# ---------------------------------------------------------------------------
# fitting
# ---------------------------------------------------------------------------

def test_piecewise_two_recovers_known_lapse():
    rng = np.random.default_rng(1)
    z = rng.uniform(0, 2500, 80)
    # inversion below 500 m (+5 K/km), standard lapse above (-6.5 K/km)
    true = np.where(z < 500, 0.005 * (z - 500) + 12.0,
                    -0.0065 * (z - 500) + 12.0)
    obs = true + rng.normal(0, 0.05, 80)
    pmin = jnp.array([0.0, 0.0, -0.05, -0.05])
    pmax = jnp.array([2500.0, 30.0, 0.05, 0.05])
    params, r2 = fitting.best_fitting_marquardt(
        fitting.lapse_piecewise_two, pmin, pmax, z, obs)
    assert float(r2) > 0.98
    assert abs(float(params[0]) - 500.0) < 150.0
    assert abs(float(params[3]) + 0.0065) < 0.001


def test_piecewise_three_free_shapes():
    p = jnp.array([500.0, 10.0, 300.0, -0.002, 0.004, -0.007])
    lo = float(fitting.lapse_piecewise_three_free(jnp.asarray(0.0), p))
    mid = float(fitting.lapse_piecewise_three_free(jnp.asarray(650.0), p))
    hi = float(fitting.lapse_piecewise_three_free(jnp.asarray(2000.0), p))
    assert lo == pytest.approx(10.0 - 0.004 * 500.0)
    assert mid == pytest.approx(10.0 - 0.002 * 150.0)
    # continuity at both knees
    eps = 1e-6
    for knee in (500.0, 800.0):
        a = float(fitting.lapse_piecewise_three_free(jnp.asarray(knee - eps), p))
        b = float(fitting.lapse_piecewise_three_free(jnp.asarray(knee + eps), p))
        assert a == pytest.approx(b, abs=1e-4)
    assert hi < mid


def test_weighted_multilinear_exact():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(40, 2))
    y = 3.0 * X[:, 0] - 1.5 * X[:, 1] + 0.7
    slopes, intercept = fitting.weighted_multilinear(X, y, np.ones(40))
    np.testing.assert_allclose(np.asarray(slopes), [3.0, -1.5], atol=1e-8)
    assert float(intercept) == pytest.approx(0.7, abs=1e-8)


# ---------------------------------------------------------------------------
# multiple detrending
# ---------------------------------------------------------------------------

def test_multiple_detrending_elevation_and_proxy():
    x, y, z, rng = _stations(60, seed=3)
    sea_dist = rng.uniform(0, 100_000, 60)
    v = 25.0 - 0.0065 * z + 2e-5 * sea_dist + rng.normal(0, 0.02, 60)
    detr, model = multiple_detrending(v, z, other_proxies=[sea_dist])
    assert bool(model.elevation_significant)
    assert float(model.elevation_r2) > 0.95
    # detrended residuals should be flat vs both proxies
    d = np.asarray(detr)
    ok = d != NODATA
    assert np.std(d[ok]) < 0.5
    # retrending at the stations reproduces the signal
    rt = np.asarray(retrend_map(model, z, [sea_dist]))
    est = d + rt
    np.testing.assert_allclose(est[ok], v[ok], atol=0.5)


def test_multiple_detrending_insignificant_elevation():
    x, y, z, rng = _stations(30, seed=4)
    z_flat = np.full_like(z, 100.0)  # no elevation variability
    v = rng.normal(10, 1.0, 30)
    detr, model = multiple_detrending(v, z_flat)
    assert not bool(model.elevation_significant)
    np.testing.assert_allclose(np.asarray(detr), v)


# ---------------------------------------------------------------------------
# shepard
# ---------------------------------------------------------------------------

def test_shepard_map_reproduces_constant_field():
    x, y, z, rng = _stations(25, seed=5)
    v = np.full(25, 7.5)
    gx, gy = np.meshgrid(np.linspace(0, 50_000, 12),
                         np.linspace(0, 50_000, 12))
    for modified in (False, True):
        m = np.asarray(shepard_idw_map(x, y, v, gx, gy, modified=modified))
        valid = m != NODATA
        assert valid.all()
        np.testing.assert_allclose(m, 7.5, atol=1e-6)


def test_shepard_interpolates_smooth_gradient():
    x, y, z, rng = _stations(40, seed=6)
    v = 1e-4 * x + 2e-4 * y
    gx, gy = np.meshgrid(np.linspace(10_000, 40_000, 8),
                         np.linspace(10_000, 40_000, 8))
    m = np.asarray(shepard_idw_map(x, y, v, gx, gy))
    truth = 1e-4 * gx + 2e-4 * gy
    assert np.abs(m - truth).mean() < 1.0


# ---------------------------------------------------------------------------
# local detrending
# ---------------------------------------------------------------------------

def test_local_detrending_tracks_spatially_varying_lapse():
    rng = np.random.default_rng(7)
    n = 80
    x = rng.uniform(0, 100_000, n)
    y = rng.uniform(0, 100_000, n)
    z = rng.uniform(0, 2000, n)
    # lapse rate varies east->west: -5 K/km to -8 K/km
    lapse = -0.005 - 0.003 * (x / 100_000)
    v = 20.0 + lapse * z
    gx, gy = np.meshgrid(np.linspace(20_000, 80_000, 6),
                         np.linspace(20_000, 80_000, 6))
    gz = np.full_like(gx, 1000.0)
    m = np.asarray(local_detrending_map(
        x, y, z, v, gx, gy, gz,
        options=DetrendingOptions(min_points_local=15, n_lm_iterations=40)))
    truth = 20.0 + (-0.005 - 0.003 * (gx / 100_000)) * 1000.0
    assert np.abs(m - truth).mean() < 1.0


# ---------------------------------------------------------------------------
# glocal
# ---------------------------------------------------------------------------

def test_glocal_weight_maps_partition_of_unity():
    zones = np.ones((20, 20), np.int32)
    zones[:, 10:] = 2
    zones[0, 0] = 0   # invalid cell
    w = np.asarray(glocal_weight_maps(zones, window_width=3.0, cellsize=1.0))
    assert w.shape == (2, 20, 20)
    s = w.sum(axis=0)
    valid = zones > 0
    np.testing.assert_allclose(s[valid], 1.0, atol=1e-6)
    assert s[0, 0] == 0.0
    # interior cells are pure; the boundary strip is blended
    assert w[0, 10, 2] == pytest.approx(1.0)
    assert 0.0 < w[0, 10, 10] < 1.0


def test_glocal_detrending_blends_area_models():
    rng = np.random.default_rng(8)
    n = 60
    x = np.concatenate([rng.uniform(0, 45_000, n // 2),
                        rng.uniform(55_000, 100_000, n // 2)])
    y = rng.uniform(0, 100_000, n)
    z = rng.uniform(0, 1500, n)
    # two regimes with different lapse rates
    v = np.where(x < 50_000, 20.0 - 0.004 * z, 24.0 - 0.008 * z)
    zones = np.ones((10, 10), np.int32)
    zones[:, 5:] = 2
    w = glocal_weight_maps(zones, window_width=2.0, cellsize=10_000.0)
    gx, gy = np.meshgrid(np.arange(10) * 10_000.0 + 5_000.0,
                         np.arange(10) * 10_000.0 + 5_000.0)
    gz = np.full_like(gx, 800.0)
    area_stations = [np.nonzero(x < 50_000)[0], np.nonzero(x >= 50_000)[0]]
    m = np.asarray(glocal_detrending_map(
        x, y, z, v, gx, gy, gz, area_stations=area_stations, area_weights=w))
    # deep inside each area the model matches that area's regime
    assert abs(m[5, 1] - (20.0 - 0.004 * 800.0)) < 1.0
    assert abs(m[5, 8] - (24.0 - 0.008 * 800.0)) < 1.0


# ---------------------------------------------------------------------------
# topographic distance + CV
# ---------------------------------------------------------------------------

def test_topographic_distance_ridge():
    # 1-row DEM with a 500 m ridge between two 100 m stations
    dem = np.full((1, 101), 100.0)
    dem[0, 45:56] = 600.0
    td = float(topographic_distance(
        dem, 0.0, 0.0, 100.0, 1,
        x1=500.0, y1=50.0, z1=100.0, x2=9500.0, y2=50.0, z2=100.0,
        distance=9000.0, max_steps=128))
    assert td == pytest.approx(500.0)
    # no ridge -> zero
    flat = np.full((1, 101), 100.0)
    td0 = float(topographic_distance(
        flat, 0.0, 0.0, 100.0, 1,
        x1=500.0, y1=50.0, z1=100.0, x2=9500.0, y2=50.0, z2=100.0,
        distance=9000.0, max_steps=128))
    assert td0 == 0.0


def test_optimize_topo_kh_prefers_barrier_separation():
    # two climate regimes separated by a ridge: high Kh should win
    rng = np.random.default_rng(9)
    n = 24
    x = np.concatenate([rng.uniform(0, 40_000, n // 2),
                        rng.uniform(60_000, 100_000, n // 2)])
    y = rng.uniform(0, 10_000, n)
    z = np.full(n, 200.0)
    v = np.where(x < 50_000, 10.0, 20.0) + rng.normal(0, 0.1, n)
    ncols = 101
    dem = np.full((1, ncols), 200.0)
    dem[0, 45:56] = 2000.0
    topo, dist = topographic_distance_matrix(
        dem, 0.0, 0.0, 1000.0, 1, x, y, z, max_steps=128)
    err0 = float(cross_validation_error(x, y, z, v, kh=0.0, topo_dist=topo))
    kh = optimize_topo_kh(x, y, z, v, topo_dist=topo, max_kh=128.0)
    err_kh = float(cross_validation_error(x, y, z, v, kh=float(kh),
                                          topo_dist=topo))
    assert kh > 0
    assert err_kh < err0


def test_loo_residuals_flag_outlier():
    x, y, z, rng = _stations(25, seed=10)
    v = np.full(25, 5.0)
    v[7] = 50.0
    r = np.asarray(loo_residuals(x, y, z, v))
    assert abs(r[7]) > 40.0
    assert abs(r[7]) > 10 * np.median(np.abs(np.delete(r, 7)))


# ---------------------------------------------------------------------------
# kriging
# ---------------------------------------------------------------------------

def test_kriging_exact_interpolator():
    x, y, z, rng = _stations(20, seed=11)
    v = 1e-4 * x + rng.normal(0, 0.01, 20)
    model = kriging.VariogramModel(kriging.SPHERICAL, nugget=0.0, sill=4.0,
                                   range_=30_000.0)
    est = np.asarray(kriging.ordinary_kriging(x, y, v, x, y, model))
    np.testing.assert_allclose(est, v, atol=1e-6)  # zero-nugget: exact at data


def test_kriging_weights_sum_to_one():
    x, y, z, rng = _stations(15, seed=12)
    v = np.full(15, 3.25)
    model = kriging.VariogramModel(kriging.EXPONENTIAL, nugget=0.1, sill=2.0,
                                   range_=20_000.0)
    gx, gy = np.meshgrid(np.linspace(0, 50_000, 7), np.linspace(0, 50_000, 7))
    est = np.asarray(kriging.ordinary_kriging(x, y, v, gx, gy, model))
    np.testing.assert_allclose(est, 3.25, atol=1e-8)


def test_variogram_fit_recovers_spherical():
    rng = np.random.default_rng(13)
    n = 150
    x = rng.uniform(0, 50_000, n)
    y = rng.uniform(0, 50_000, n)
    # smooth random field with ~10 km correlation via cosine mixture
    v = np.zeros(n)
    for _ in range(40):
        kx, ky = rng.normal(0, 1.0 / 10_000.0, 2)
        ph = rng.uniform(0, 2 * np.pi)
        v += np.cos(kx * x + ky * y + ph)
    v /= np.sqrt(20)
    h, g, c = kriging.empirical_variogram(x, y, v, n_bins=15)
    fitted = kriging.fit_variogram(h, g, c)
    assert fitted.sill > fitted.nugget
    est = np.asarray(kriging.ordinary_kriging(x, y, v, x[:5] + 100.0, y[:5],
                                              fitted))
    assert np.abs(est - v[:5]).mean() < np.std(v)


def test_variogram_models_at_range():
    for mode, expected in [(kriging.SPHERICAL, 1.0),
                           (kriging.EXPONENTIAL, 1 - np.exp(-3.0)),
                           (kriging.GAUSSIAN, 1 - np.exp(-4.0))]:
        m = kriging.VariogramModel(mode, nugget=0.0, sill=1.0, range_=100.0)
        assert float(kriging.variogram(100.0, m)) == pytest.approx(expected)
