"""Multiple / local / glocal proxy detrending, topographic distance and
cross-validation for meteorological interpolation.

TPU-native re-design of the reference's advanced detrending stack
(agrolib/interpolation/interpolation.cpp):

- **multiple detrending** (multipleDetrendingMain, :1832-1859): the elevation
  proxy is fitted with a piecewise lapse-rate function by multi-start
  Levenberg-Marquardt (weighted); the remaining proxies with a summed linear
  fit. Here the multi-start runs batched under `vmap`
  (`physics/fitting.py`) and the linear part is solved in closed form.
- **local detrending** (interpolationDemLocalDetrending, project.cpp:3158-3263;
  localSelection, interpolation.cpp:1087-1171): the reference loops DEM cells
  under OpenMP, selecting a neighbourhood and re-fitting per cell. Here the
  whole per-cell pipeline — neighbour selection, distance weights, weighted
  elevation fit, residual interpolation, retrend — is **one vmapped program
  over cells**: thousands of small fits become batched matmuls on the MXU.
- **glocal detrending** (glocalDetrendingFitting, interpolation.cpp:2236-2292;
  interpolationDemGlocalDetrending, project.cpp:3267-3388): per-macro-area
  fits blended by per-cell area-weight maps. The weight maps themselves
  (writeGlocalWeightsMaps, project.cpp:2437-2521 — a per-cell window count)
  are re-expressed as one-hot zone masks convolved with a disc kernel.
- **topographic distance** (gis.cpp:1595-1646) ray-marches the DEM between
  two points collecting the maximum rise above the lower endpoint; the
  multiplier Kh is optimized by golden-section search on the leave-one-out
  cross-validation error (goldenSectionSearch / topographicDistanceOptimize,
  interpolation.cpp:2297-2392).
- **cross-validation** (computeResiduals / computeErrorCrossValidation,
  spatialControl.cpp:102-334): leave-one-out residuals for every station at
  once (vectorized over the station axis instead of a serial loop).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from criteria3d_tpu.constants import EPSILON, NODATA
from criteria3d_tpu.physics import fitting
from criteria3d_tpu.physics.fitting import (ELEVATION_FUNCTIONS,
                                            best_fitting_marquardt,
                                            weighted_multilinear)

__all__ = [
    "DetrendingOptions", "TrendModel", "multiple_detrending", "retrend_map",
    "local_detrending_map", "glocal_weight_maps", "glocal_detrending_map",
    "topographic_distance", "topographic_distance_matrix",
    "optimize_topo_kh", "loo_residuals", "cross_validation_error",
]

MIN_PROXY_POINTS = 5  # proxyValidity MIN_NR (interpolation.cpp:1461)


@dataclasses.dataclass(frozen=True)
class DetrendingOptions:
    """Knobs of Crit3DInterpolationSettings relevant to detrending."""

    elevation_function: str = "double_piecewise"   # TFittingFunction names
    elevation_std_threshold: float = 100.0         # [m] proxy stddev gate
    proxy_std_threshold: float = 0.01              # other proxies
    min_points_local: int = 20                     # getMinPointsLocalDetrending
    n_lm_iterations: int = 60
    # parameter box for the elevation fit, relative to data ranges
    # (setFittingParameters_elevation + setMultipleDetrendingHeightTemperatureRange)
    t_margin_low: float = 2.0
    t_margin_high: float = 6.0


@dataclasses.dataclass(frozen=True)
class TrendModel:
    """Fitted detrending model: elevation lapse curve + linear proxies."""

    elevation_params: jax.Array        # (n_par,) piecewise parameters
    elevation_significant: jax.Array   # scalar bool
    elevation_r2: jax.Array            # scalar
    linear_slopes: jax.Array           # (n_other,)
    linear_intercept: jax.Array        # scalar
    linear_significant: jax.Array      # (n_other,) bool
    elevation_function: str = "double_piecewise"

    def elevation_trend(self, z):
        func, _ = ELEVATION_FUNCTIONS[self.elevation_function]
        t = func(jnp.asarray(z, jnp.float64), self.elevation_params)
        return jnp.where(self.elevation_significant, t, 0.0)

    def proxy_trend(self, proxy_values):
        """proxy_values: (..., n_other) stacked on the last axis."""
        pv = jnp.asarray(proxy_values, jnp.float64)
        sl = jnp.where(self.linear_significant, self.linear_slopes, 0.0)
        any_sig = jnp.any(self.linear_significant)
        return jnp.where(any_sig,
                         pv @ sl + self.linear_intercept, 0.0)


def _proxy_validity(values, mask, threshold):
    """proxyValidity (interpolation.cpp:1455-1496): >= 5 valid points and
    sample stddev above the threshold."""
    n = jnp.sum(mask)
    w = mask.astype(values.dtype)
    avg = jnp.sum(w * values) / jnp.maximum(n, 1)
    var = jnp.sum(w * (values - avg) ** 2) / jnp.maximum(n - 1, 1)
    return (n >= MIN_PROXY_POINTS) & (jnp.sqrt(var) > threshold)


def _elevation_bounds(z, values, mask, options: DetrendingOptions):
    """Parameter box for the piecewise elevation fit.

    Knee heights span the data elevation range; level spans the observed
    value range with the reference's -2/+6 margins
    (setMultipleDetrendingHeightTemperatureRange, interpolation.cpp:1506-1553);
    slopes within ±0.05 (unit per metre) as in the default proxy ranges.
    """
    big = 1e30
    zmin = jnp.min(jnp.where(mask, z, big))
    zmax = jnp.max(jnp.where(mask, z, -big))
    vmin = jnp.min(jnp.where(mask, values, big)) - options.t_margin_low
    vmax = jnp.max(jnp.where(mask, values, -big)) + options.t_margin_high
    n_par = ELEVATION_FUNCTIONS[options.elevation_function][1]
    slope_lo, slope_hi = -0.05, 0.05
    if n_par == 4:      # x0, y0, s1, s2
        pmin = jnp.stack([zmin, vmin, jnp.asarray(slope_lo), jnp.asarray(slope_lo)])
        pmax = jnp.stack([zmax, vmax, jnp.asarray(slope_hi), jnp.asarray(slope_hi)])
    elif n_par == 5:    # x0, y0, dx, s_mid, s_outer
        pmin = jnp.stack([zmin, vmin, jnp.asarray(10.0),
                          jnp.asarray(slope_lo), jnp.asarray(slope_lo)])
        pmax = jnp.stack([zmax, vmax, zmax - zmin,
                          jnp.asarray(slope_hi), jnp.asarray(slope_hi)])
    else:               # x0, y0, dx, s_mid, s_lo, s_hi
        pmin = jnp.stack([zmin, vmin, jnp.asarray(10.0), jnp.asarray(slope_lo),
                          jnp.asarray(slope_lo), jnp.asarray(slope_lo)])
        pmax = jnp.stack([zmax, vmax, zmax - zmin, jnp.asarray(slope_hi),
                          jnp.asarray(slope_hi), jnp.asarray(slope_hi)])
    return pmin, pmax


def multiple_detrending(station_value, station_z, other_proxies=(), *,
                        weights=None, active=None,
                        options: DetrendingOptions = DetrendingOptions()):
    """Fit elevation + linear proxy trends; return (detrended values, model).

    Mirrors multipleDetrendingMain (interpolation.cpp:1832-1859): elevation
    first (weighted piecewise fit, significance-gated by proxy variability),
    then the other proxies on the elevation-detrended values (closed-form
    weighted multilinear).

    ``other_proxies``: sequence of per-station arrays. Stations with missing
    (NODATA) proxies are masked, as the reference erases them.
    """
    v = jnp.asarray(station_value, jnp.float64)
    z = jnp.asarray(station_z, jnp.float64)
    ok = (v != NODATA) & (z != NODATA)
    if active is not None:
        ok = ok & jnp.asarray(active)
    w = jnp.ones_like(v) if weights is None else jnp.asarray(weights, jnp.float64)
    w = jnp.where(ok, jnp.maximum(w, EPSILON), 0.0)

    func, n_par = ELEVATION_FUNCTIONS[options.elevation_function]
    elev_valid = _proxy_validity(z, ok, options.elevation_std_threshold)
    pmin, pmax = _elevation_bounds(z, v, ok, options)
    params, r2 = best_fitting_marquardt(func, pmin, pmax, z, v, w,
                                        n_iter=options.n_lm_iterations)
    elev_sig = elev_valid & (r2 > 0)
    detrended = jnp.where(elev_sig & ok, v - func(z, params), v)

    n_other = len(other_proxies)
    if n_other:
        P = jnp.stack([jnp.asarray(p, jnp.float64) for p in other_proxies],
                      axis=1)                               # (n_st, n_other)
        p_ok = jnp.all(P != NODATA, axis=1) & ok
        sig = jnp.array([
            _proxy_validity(P[:, i], p_ok, options.proxy_std_threshold)
            for i in range(n_other)])
        wp = jnp.where(p_ok, w, 0.0)
        Pm = jnp.where(sig[None, :], P, 0.0)
        slopes, intercept = weighted_multilinear(Pm, detrended, wp)
        slopes = jnp.where(sig, slopes, 0.0)
        any_sig = jnp.any(sig)
        intercept = jnp.where(any_sig, intercept, 0.0)
        trend = Pm @ slopes + intercept
        detrended = jnp.where(p_ok & any_sig, detrended - trend, detrended)
        # points with incomplete proxies are dropped by the reference
        # (multipleDetrendingOtherProxiesFitting, interpolation.cpp:2034-2063)
        detrended = jnp.where(jnp.where(any_sig, p_ok, ok), detrended, NODATA)
    else:
        sig = jnp.zeros((0,), bool)
        slopes = jnp.zeros((0,), jnp.float64)
        intercept = jnp.asarray(0.0, jnp.float64)
        detrended = jnp.where(ok, detrended, NODATA)

    model = TrendModel(elevation_params=params,
                       elevation_significant=elev_sig,
                       elevation_r2=r2,
                       linear_slopes=slopes,
                       linear_intercept=intercept,
                       linear_significant=sig,
                       elevation_function=options.elevation_function)
    return detrended, model


def retrend_map(model: TrendModel, grid_z, grid_other_proxies=()):
    """Trend surface at grid cells (retrend, interpolation.cpp:1294-1378)."""
    t = model.elevation_trend(jnp.asarray(grid_z, jnp.float64))
    if len(grid_other_proxies):
        P = jnp.stack([jnp.asarray(p, jnp.float64) for p in grid_other_proxies],
                      axis=-1)
        t = t + model.proxy_trend(jnp.where(P == NODATA, 0.0, P))
    return t


# ---------------------------------------------------------------------------
# local detrending — one vmapped per-cell pipeline
# ---------------------------------------------------------------------------

def local_detrending_map(station_x, station_y, station_z, station_value,
                         grid_x, grid_y, grid_z, *,
                         options: DetrendingOptions = DetrendingOptions(),
                         n_first_guesses: int = 16, active=None):
    """Per-cell neighbourhood detrended interpolation.

    For every target cell: select the ``ceil(1.2 * min_points)`` nearest
    stations (the fixed-size expression of localSelection's expanding rings,
    interpolation.cpp:1087-1171), weight them ``max(1 - d/d_max, eps)``
    (:1160), fit the piecewise elevation curve with those weights, then
    interpolate the residuals with the modified-Shepard kernel inside the
    local radius and retrend with the cell's own elevation.

    The reference runs this per DEM cell under OpenMP; here the entire
    pipeline is vmapped over cells so the per-cell 4-parameter fits become
    one batched TPU program.
    """
    sx = jnp.asarray(station_x, jnp.float64)
    sy = jnp.asarray(station_y, jnp.float64)
    sz = jnp.asarray(station_z, jnp.float64)
    sv = jnp.asarray(station_value, jnp.float64)
    ok = (sv != NODATA) & (sz != NODATA)
    if active is not None:
        ok = ok & jnp.asarray(active)
    n_st = sv.shape[0]
    k = min(n_st, int(math.ceil(options.min_points_local * 1.2)))

    gx = jnp.asarray(grid_x, jnp.float64).ravel()
    gy = jnp.asarray(grid_y, jnp.float64).ravel()
    gz = jnp.asarray(grid_z, jnp.float64).ravel()

    func, n_par = ELEVATION_FUNCTIONS[options.elevation_function]

    def per_cell(cx, cy, cz):
        d = jnp.sqrt((sx - cx) ** 2 + (sy - cy) ** 2)
        d = jnp.where(ok, d, jnp.inf)
        neg_d, idx = lax.top_k(-d, k)
        nd = -neg_d                                   # ascending distances
        valid = jnp.isfinite(nd)
        d_max = jnp.max(jnp.where(valid, nd, 0.0))
        w = jnp.where(valid,
                      jnp.maximum(1.0 - nd / jnp.maximum(d_max, EPSILON),
                                  EPSILON), 0.0)
        vz = sz[idx]
        vv = sv[idx]

        elev_valid = _proxy_validity(vz, valid, options.elevation_std_threshold)
        pmin, pmax = _elevation_bounds(vz, vv, valid, options)
        params, r2 = best_fitting_marquardt(
            func, pmin, pmax, vz, vv, w,
            first_guesses=fitting.first_guess_grid(
                pmin, pmax, steps_per_param=2),
            n_iter=options.n_lm_iterations)
        sig = elev_valid & (r2 > 0)
        resid = jnp.where(sig, vv - func(vz, params), vv)

        # modified-Shepard residual interpolation within the local radius
        # (modifiedShepardIdw, interpolation.cpp:948-1029)
        radius = d_max + EPSILON
        s = jnp.where(valid & (nd > 0),
                      (radius - nd) / (radius * jnp.maximum(nd, EPSILON)), 0.0)
        exact = valid & (nd <= EPSILON)
        s2 = s * s
        est = jnp.sum(s2 * resid) / jnp.maximum(jnp.sum(s2), 1e-30)
        est = jnp.where(jnp.any(exact),
                        jnp.sum(jnp.where(exact, resid, 0.0))
                        / jnp.maximum(jnp.sum(exact), 1), est)
        trend = jnp.where(sig, func(cz, params), 0.0)
        return est + trend

    flat = jax.vmap(per_cell)(gx, gy, gz)
    return flat.reshape(jnp.asarray(grid_x).shape)


# ---------------------------------------------------------------------------
# glocal detrending — macro areas blended by convolved weight maps
# ---------------------------------------------------------------------------

def glocal_weight_maps(zone_map, window_width: float, cellsize: float):
    """Per-zone blending weights: fraction of cells of each zone within a
    disc window around every cell.

    The reference computes this with a per-cell window scan
    (writeGlocalWeightsMaps, project.cpp:2437-2521). Convolving each
    one-hot zone mask with the disc kernel gives the identical counts as
    XLA convolutions. ``zone_map``: (R, C) int zone ids starting at 1,
    <=0 / NODATA outside. Returns (n_zones, R, C) float weights summing to
    1 on valid cells.
    """
    zm = jnp.asarray(zone_map)
    n_zones = int(np.asarray(jnp.max(zm)))
    cell_nr = int(round(window_width / cellsize))
    r = jnp.arange(-cell_nr, cell_nr + 1)
    disc = (r[:, None] ** 2 + r[None, :] ** 2) <= cell_nr ** 2
    kernel = disc.astype(jnp.float32)[None, None]

    valid = (zm > 0)
    onehot = jnp.stack([(zm == z + 1) & valid for z in range(n_zones)])
    x = onehot.astype(jnp.float32)[:, None]            # (Z, 1, R, C)
    counts = lax.conv_general_dilated(x, kernel, (1, 1), "SAME")[:, 0]
    total = lax.conv_general_dilated(valid.astype(jnp.float32)[None, None],
                                     kernel, (1, 1), "SAME")[0, 0]
    w = jnp.where(valid[None] & (total > 0), counts / jnp.maximum(total, 1), 0.0)
    return w


def glocal_detrending_map(station_x, station_y, station_z, station_value,
                          grid_x, grid_y, grid_z, *,
                          area_stations: Sequence[np.ndarray],
                          area_weights, active=None,
                          options: DetrendingOptions = DetrendingOptions()):
    """Macro-area detrended interpolation blended by per-cell area weights.

    Per area: unweighted multiple detrending on the area's station subset
    (glocalDetrendingFitting, interpolation.cpp:2236-2292; isWeighted=false),
    residual IDW over the whole grid, retrend — then the per-area maps are
    combined with ``area_weights`` (n_areas, R, C). The reference accumulates
    per-cell under an OpenMP critical section (project.cpp:3373-3380); here
    the blend is one weighted sum of dense maps.

    ``area_stations[i]``: integer indices of the stations belonging to area i
    (the glocal stations CSV, Project::loadGlocalStationsAndCells).
    """
    from criteria3d_tpu.physics.interpolation import idw_map

    sv = jnp.asarray(station_value, jnp.float64)
    ok = sv != NODATA
    if active is not None:
        ok = ok & jnp.asarray(active)

    aw = jnp.asarray(area_weights, jnp.float64)
    out = jnp.zeros_like(jnp.asarray(grid_z, jnp.float64))
    wsum = jnp.zeros_like(out)
    for i, idx in enumerate(area_stations):
        idx = np.asarray(idx, np.int64)
        if idx.size == 0:
            continue
        member = np.zeros(sv.shape[0], bool)
        member[idx] = True
        m_ok = ok & jnp.asarray(member)
        detr, model = multiple_detrending(
            jnp.where(m_ok, sv, NODATA), station_z,
            active=m_ok, options=options)
        resid_map = idw_map(station_x, station_y, detr, grid_x, grid_y,
                            active=m_ok)
        area_map = jnp.where(resid_map != NODATA,
                             resid_map + retrend_map(model, grid_z), 0.0)
        out = out + aw[i] * area_map
        wsum = wsum + jnp.where(resid_map != NODATA, aw[i], 0.0)
    return jnp.where(wsum > 0, out / jnp.maximum(wsum, 1e-30), NODATA)


# ---------------------------------------------------------------------------
# topographic distance
# ---------------------------------------------------------------------------

def topographic_distance(dem, header_x0, header_y0, cellsize, nrows,
                         x1, y1, z1, x2, y2, z2, distance, max_steps: int):
    """Maximum DEM rise above the lower endpoint along the segment
    (gis::topographicDistance, gis.cpp:1595-1646).

    Marches from the lower of the two points in ``nrStep = distance/cellsize``
    steps, sampling the DEM by nearest cell; fixed ``max_steps`` with masking
    keeps it jittable.
    """
    dem = jnp.asarray(dem, jnp.float64)
    lower_first = z1 < z2
    xi = jnp.where(lower_first, x1, x2)
    yi = jnp.where(lower_first, y1, y2)
    zi = jnp.where(lower_first, z1, z2)
    xf = jnp.where(lower_first, x2, x1)
    yf = jnp.where(lower_first, y2, y1)

    nr_step = jnp.floor(distance / cellsize).astype(jnp.int32)
    i = jnp.arange(1, max_steps + 1)
    frac = i.astype(jnp.float64) / jnp.maximum(nr_step, 1)
    px = xi + frac * (xf - xi)
    py = yi + frac * (yf - yi)
    col = jnp.clip(((px - header_x0) / cellsize - 0.5).round().astype(jnp.int32),
                   0, dem.shape[1] - 1)
    row = jnp.clip((nrows - (py - header_y0) / cellsize - 0.5).round()
                   .astype(jnp.int32), 0, dem.shape[0] - 1)
    v = dem[row, col]
    in_march = (i <= nr_step) & (v != NODATA)
    rise = jnp.where(in_march & (v > zi), v - zi, 0.0)
    return jnp.where(distance < cellsize, 0.0, jnp.max(rise))


def topographic_distance_matrix(dem, header_x0, header_y0, cellsize, nrows,
                                station_x, station_y, station_z,
                                max_steps: int = 256):
    """(n, n) pairwise topographic distances between stations (used by the
    Kh optimization; the per-station maps of writeTopographicDistanceMaps
    are the grid-side analogue)."""
    sx = jnp.asarray(station_x, jnp.float64)
    sy = jnp.asarray(station_y, jnp.float64)
    sz = jnp.asarray(station_z, jnp.float64)
    d = jnp.sqrt((sx[:, None] - sx[None, :]) ** 2
                 + (sy[:, None] - sy[None, :]) ** 2)

    def one(x1, y1, z1):
        return jax.vmap(lambda x2, y2, z2, dd: topographic_distance(
            dem, header_x0, header_y0, cellsize, nrows,
            x1, y1, z1, x2, y2, z2, dd, max_steps))(
            sx, sy, sz, jnp.sqrt((sx - x1) ** 2 + (sy - y1) ** 2))

    return jax.vmap(one)(sx, sy, sz), d


def loo_residuals(station_x, station_y, station_z, station_value, *,
                  kh: float = 0.0, topo_dist=None, active=None,
                  detrend_model: TrendModel | None = None):
    """Leave-one-out residuals: each station re-estimated from the others by
    (detrended) IDW with optional topographic-distance weighting
    (computeResiduals, spatialControl.cpp:102-160). Vectorized over the
    excluded-station axis."""
    sx = jnp.asarray(station_x, jnp.float64)
    sy = jnp.asarray(station_y, jnp.float64)
    sz = jnp.asarray(station_z, jnp.float64)
    sv = jnp.asarray(station_value, jnp.float64)
    ok = sv != NODATA
    if active is not None:
        ok = ok & jnp.asarray(active)

    if detrend_model is not None:
        resid = jnp.where(ok, sv - detrend_model.elevation_trend(sz), sv)
        trend = detrend_model.elevation_trend(sz)
    else:
        resid = sv
        trend = jnp.zeros_like(sv)

    n = sv.shape[0]
    d = jnp.sqrt((sx[:, None] - sx[None, :]) ** 2
                 + (sy[:, None] - sy[None, :]) ** 2)
    if topo_dist is not None:
        d = d + kh * jnp.asarray(topo_dist, jnp.float64)
    other = (~jnp.eye(n, dtype=bool)) & ok[None, :]
    d_km = jnp.where(other, jnp.maximum(d, EPSILON), jnp.inf) / 10000.0
    w = 1.0 / (d_km ** 3)
    est = (jnp.sum(jnp.where(other, w * resid[None, :], 0.0), axis=1)
           / jnp.maximum(jnp.sum(jnp.where(other, w, 0.0), axis=1), 1e-30))
    residual = sv - (est + trend)
    return jnp.where(ok, residual, NODATA)


def cross_validation_error(station_x, station_y, station_z, station_value,
                           **kw):
    """Mean absolute LOO error (computeErrorCrossValidation,
    spatialControl.cpp:310-333)."""
    r = loo_residuals(station_x, station_y, station_z, station_value, **kw)
    ok = r != NODATA
    return (jnp.sum(jnp.where(ok, jnp.abs(r), 0.0))
            / jnp.maximum(jnp.sum(ok), 1))


GOLDEN_SECTION = (1.0 + math.sqrt(5.0)) / 2.0


def optimize_topo_kh(station_x, station_y, station_z, station_value, *,
                     topo_dist, max_kh: float = 256.0,
                     detrend_model: TrendModel | None = None,
                     active=None):
    """Golden-section search of the topographic-distance multiplier Kh
    minimising the LOO cross-validation MAE (goldenSectionSearch +
    topographicDistanceOptimize, interpolation.cpp:2297-2392). Kh is
    truncated to int inside the objective, as in the reference."""
    err = jax.jit(lambda kh: cross_validation_error(
        station_x, station_y, station_z, station_value,
        kh=kh, topo_dist=topo_dist, detrend_model=detrend_model,
        active=active))

    def f(kh_float):
        return float(err(float(int(kh_float))))

    a, b = 0.0, float(max_kh)
    x1 = b - (b - a) / GOLDEN_SECTION
    x2 = a + (b - a) / GOLDEN_SECTION
    for _ in range(100):
        if abs(b - a) <= 1.0:
            break
        if f(x1) < f(x2):
            b, x2 = x2, x1
            x1 = b - (b - a) / GOLDEN_SECTION
        else:
            a, x1 = x1, x2
            x2 = a + (b - a) / GOLDEN_SECTION
    return int((a + b) / 2)
