"""Station-to-grid meteorological interpolation: detrended IDW.

Vectorised re-expression of agrolib/interpolation: proxy detrending by
simple linear regression (regressionSimple/regressionGeneric,
interpolation.cpp:304-365), inverse-distance weighting with the reference's
cube-of-(distance/10km) kernel (inverseDistanceWeighted,
interpolation.cpp:1031-1051), retrending at the target cells and
variable-specific post-processing (interpolate, interpolation.cpp:2502-2560).

The reference's per-DEM-cell loop (Project::interpolationDemMain,
project.cpp:3531-3561) becomes a `lax.scan` over stations accumulating the
weighted sums on the whole (R, C) map at once.

Not yet covered (future rounds): kriging variograms, multiple/local/glocal
detrending, topographic-distance weighting, supplemental-station logic.
"""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp
from jax import lax

from criteria3d_tpu.constants import EPSILON, NODATA

__all__ = ["VariableKind", "idw_map", "detrended_idw", "simple_regression",
           "quality_range_check", "shepard_idw_map", "OrographyLapse",
           "regression_orography_t", "orography_trend"]


class VariableKind(enum.IntEnum):
    """Post-processing class of the interpolated variable
    (interpolate, interpolation.cpp:2540-2560)."""

    GENERIC = 0
    TEMPERATURE = 1
    PRECIPITATION = 2
    RELATIVE_HUMIDITY = 3
    NON_NEGATIVE = 4     # radiation, wind, leaf wetness, transmissivity


def simple_regression(values, proxy, active=None):
    """(slope, intercept, r2) of values ~ proxy over active stations.

    Mirrors regressionSimple (interpolation.cpp:304-344) + statistics.cpp
    linearRegression. Inactive/NODATA stations are excluded by masking.
    """
    values = jnp.asarray(values, jnp.float64)
    proxy = jnp.asarray(proxy, jnp.float64)
    ok = (values != NODATA) & (proxy != NODATA)
    if active is not None:
        ok = ok & active
    n = jnp.maximum(jnp.sum(ok), 1)
    w = ok.astype(values.dtype)
    mx = jnp.sum(w * proxy) / n
    my = jnp.sum(w * values) / n
    sxx = jnp.sum(w * (proxy - mx) ** 2)
    sxy = jnp.sum(w * (proxy - mx) * (values - my))
    syy = jnp.sum(w * (values - my) ** 2)
    slope = jnp.where(sxx > 0, sxy / jnp.maximum(sxx, 1e-12), 0.0)
    intercept = my - slope * mx
    r2 = jnp.where((sxx > 0) & (syy > 0),
                   (sxy * sxy) / jnp.maximum(sxx * syy, 1e-12), 0.0)
    return slope, intercept, r2


# ----------------------------------------------------------------------
# thermal-inversion orography lapse (regressionOrographyT)
# ----------------------------------------------------------------------

MIN_REGRESSION_POINTS = 5    # interpolationConstants.h:4
_DELTAZ_INI = 80.0           # interpolation.cpp:450


@dataclasses.dataclass(frozen=True)
class OrographyLapse:
    """Fitted piecewise elevation lapse (Crit3DProxy orography state,
    interpolationSettings.h:40-50): below the inversion top ``h1`` the
    value increases with height at ``inversion_lapse``; above it decreases
    at ``slope``. ``valid=False`` means no usable fit (no detrending)."""

    valid: bool = False
    inversion_significant: bool = False
    h0: float = 0.0
    h1: float = 0.0
    t0: float = 0.0
    t1: float = 0.0
    inversion_lapse: float = 0.0
    slope: float = 0.0
    r2: float = 0.0


def _linreg(x, y):
    """(intercept q, slope m, r2) — statistics::linearRegression."""
    import numpy as np
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    if len(x) < 2 or np.ptp(x) == 0.0:
        return 0.0, 0.0, 0.0
    mx, my = x.mean(), y.mean()
    sxx = ((x - mx) ** 2).sum()
    sxy = ((x - mx) * (y - my)).sum()
    syy = ((y - my) ** 2).sum()
    m = sxy / sxx
    q = my - m * mx
    r2 = (sxy * sxy) / (sxx * syy) if syy > 0 else 0.0
    return float(q), float(m), float(r2)


def _intersect(q1, m1, q2, m2):
    """findLinesIntersection (basicMath.cpp:138-152)."""
    if abs(m1 - m2) < 1e-12:
        return None
    x = (q2 - q1) / (m1 - m2)
    return x, m1 * x + q1


def regression_orography_t(heights, values, *, climate_lapse_rate=0.0,
                           max_height_inversion=1000.0,
                           min_regression_r2=0.1) -> OrographyLapse:
    """Thermal-inversion elevation lapse fit for temperature-like
    variables (regressionOrographyT, interpolation.cpp:433-797).

    Height-interval averages (80 m bands growing exponentially toward the
    1000 m max inversion height) locate the inversion top; separate
    regressions below/above it — on raw stations and on the interval
    averages as fallbacks — produce the piecewise lapse, with the monthly
    climate lapse rate as last resort. Host-side numpy: a handful of
    stations, heavy data-dependent branching, run once per hour exactly
    like the reference's serial fit.
    """
    import numpy as np

    z = np.asarray(heights, float)
    v = np.asarray(values, float)
    ok = ~np.isclose(v, NODATA) & ~np.isclose(z, NODATA)
    z, v = z[ok], v[ok]

    sig_r2 = max(min_regression_r2, 0.2)
    sig_r2_inv = max(min_regression_r2, 0.1)
    max_inv = max_height_inversion

    def generic():
        """regressionGeneric (interpolation.cpp:346-365)."""
        q, m, r2 = _linreg(z, v)
        return OrographyLapse(valid=r2 >= min_regression_r2,
                              inversion_significant=False, t0=q, slope=m,
                              r2=r2)

    if len(z) < MIN_REGRESSION_POINTS or z.max() == z.min():
        # not enough data to define a curve: climate lapse
        # (interpolation.cpp:471-473)
        return OrographyLapse(valid=True, slope=climate_lapse_rate)

    # --- height-interval averages (interpolation.cpp:475-492) ---
    max_z, h_inf = z.max(), z.min()
    int_h, int_v = [], []
    h_sup, dz = h_inf, _DELTAZ_INI
    guard = 0
    while h_sup <= max_z and guard < 1000:
        guard += 1
        avg = None
        while avg is None and guard < 1000:
            h_sup += dz
            sel = (z >= h_inf) & (z <= h_sup)
            n = int(sel.sum())
            if n > 1 or (n > 0 and h_sup >= max_z):
                avg = float(v[sel].mean())
            guard += 1
        if avg is None:
            break
        int_h.append(0.5 * (h_sup + h_inf))
        int_v.append(avg)
        dz = _DELTAZ_INI * float(np.exp(h_inf / max_inv))
        h_inf = h_sup
    if not int_h:
        return generic()

    # --- find inversion height (interpolation.cpp:494-503) ---
    h0 = 0.0
    h1, t1 = int_h[0], int_v[0]
    inv_sig = False
    for i in range(1, len(int_v)):
        if int_h[i] <= max_inv and int_v[i] >= t1 \
                and int_v[i] > int_v[0] + 0.001 * (int_h[i] - int_h[0]):
            h1, t1 = int_h[i], int_v[i]
            inv_sig = True

    if not inv_sig:
        return generic()

    below = z <= h1
    z1, v1 = z[below], v[below]
    z2, v2 = z[~below], v[~below]
    ih = np.asarray(int_h)
    iv = np.asarray(int_v)
    ibelow = ih <= h1
    ih1, iv1 = ih[ibelow], iv[ibelow]
    ih2, iv2 = ih[~ibelow], iv[~ibelow]

    # --- only positive lapse rate (interpolation.cpp:539-570) ---
    if len(iv1) == len(iv):
        q, m, r2 = _linreg(z, v)
        if r2 >= sig_r2:
            return OrographyLapse(valid=True, inversion_significant=True,
                                  h0=h0, h1=h1, t0=q, t1=q + m * h1,
                                  inversion_lapse=m,
                                  slope=climate_lapse_rate, r2=r2)
        q, m, r2 = _linreg(ih1, iv1)
        if r2 >= sig_r2:
            return OrographyLapse(valid=True, inversion_significant=True,
                                  h0=h0, h1=h1, t0=q, t1=q + m * h1,
                                  inversion_lapse=m,
                                  slope=climate_lapse_rate)
        return OrographyLapse(valid=True, inversion_significant=True,
                              h0=h0, h1=h1, t0=int_v[0], t1=t1,
                              inversion_lapse=0.0,
                              slope=climate_lapse_rate)

    # --- check inversion significance (interpolation.cpp:575-658) ---
    q1, m1, r2_values = _linreg(z1, v1)
    if len(iv1) > 2:
        _, _, r2_intervals = _linreg(ih1, iv1)
    else:
        r2_intervals = 0.0

    if r2_values < sig_r2_inv and r2_intervals < sig_r2_inv:
        # inversion not significant with data nor with intervals
        q, m, r2 = _linreg(z, v)
        if r2 >= 0.5:
            return OrographyLapse(valid=True, t0=q, slope=min(m, 0.0),
                                  r2=r2)
        # case 1: analysis only above inversion, flat lapse below
        if len(v2) >= MIN_REGRESSION_POINTS:
            q2, m2, r2a = _linreg(z2, v2)
            if r2a >= sig_r2:
                slope = min(m2, 0.0)
                t0 = q2 + h1 * slope
                return OrographyLapse(valid=True,
                                      inversion_significant=True,
                                      h0=h0, h1=h1, t0=t0, t1=t0,
                                      inversion_lapse=0.0, slope=slope,
                                      r2=r2a)
            q2, m2, r2a = _linreg(ih2, iv2)
            if r2a >= sig_r2:
                slope = min(m2, 0.0)
                t0 = q2 + h1 * slope
                return OrographyLapse(valid=True,
                                      inversion_significant=True,
                                      h0=h0, h1=h1, t0=t0, t1=t0,
                                      inversion_lapse=0.0, slope=slope,
                                      r2=r2a)
        # case 2: regression with all data
        if r2 >= sig_r2:
            return OrographyLapse(valid=True, t0=q, slope=min(m, 0.0),
                                  r2=r2)
        return OrographyLapse(valid=True, t0=int_v[0],
                              slope=0.0 if m > 0 else climate_lapse_rate)

    # --- significance analysis (interpolation.cpp:660-788) ---
    q1, m1, r21 = _linreg(z1, v1)
    q2, m2, r22 = _linreg(z2, v2)
    if m1 <= 0:
        r21 = 0.0

    def clamp_inv(h1_, t1_, t0_, lapse_, slope_):
        """max-inversion-height clamp (interpolation.cpp:682-687)."""
        if h1_ > max_inv:
            t1_ = t1_ - (h1_ - max_inv) * slope_
            h1_ = max_inv
            lapse_ = (t1_ - t0_) / (h1_ - h0)
        return h1_, t1_, lapse_

    if r21 >= sig_r2_inv and r22 >= sig_r2:
        if len(z2) < MIN_REGRESSION_POINTS and m2 > 0.0:
            m2, q2 = 0.0, t1
        cross = _intersect(q1, m1, q2, m2)
        if cross is not None:
            x, y = cross
            h1_, t1_, lapse_ = clamp_inv(x, y, q1, m1, m2)
            return OrographyLapse(valid=True, inversion_significant=True,
                                  h0=h0, h1=h1_, t0=q1, t1=t1_,
                                  inversion_lapse=lapse_, slope=m2, r2=r22)
    elif r21 < sig_r2_inv and r22 >= sig_r2:
        if len(z2) < MIN_REGRESSION_POINTS and m2 > 0.0:
            m2, q2 = 0.0, t1
        q, m, r2i = _linreg(ih1, iv1)
        if r2i >= sig_r2_inv:
            cross = _intersect(q, m, q2, m2)
            if cross is not None and cross[0] > 40.0:
                x, y = cross
                h1_, t1_, lapse_ = clamp_inv(x, y, q, m, m2)
                return OrographyLapse(valid=True,
                                      inversion_significant=True,
                                      h0=h0, h1=h1_, t0=q, t1=t1_,
                                      inversion_lapse=lapse_, slope=m2,
                                      r2=r22)
        else:
            t1_ = q2 + m2 * h1
            return OrographyLapse(valid=True, inversion_significant=True,
                                  h0=h0, h1=h1, t0=t1_, t1=t1_,
                                  inversion_lapse=0.0, slope=m2, r2=r22)
    elif r21 >= sig_r2_inv and r22 < sig_r2:
        q, m, r2i = _linreg(ih2, iv2)
        if r2i >= sig_r2:
            slope = min(m, 0.0)
            cross = _intersect(q1, m1, q, slope)
            if cross is not None:
                x, y = cross
                return OrographyLapse(valid=True,
                                      inversion_significant=True,
                                      h0=h0, h1=x, t0=q1, t1=y,
                                      inversion_lapse=m1, slope=slope,
                                      r2=r22)
        else:
            slope = climate_lapse_rate
            cross = _intersect(q1, m1, t1 - slope * h1, slope)
            if cross is not None:
                x, y = cross
                return OrographyLapse(valid=True,
                                      inversion_significant=True,
                                      h0=h0, h1=x, t0=q1, t1=y,
                                      inversion_lapse=m1, slope=slope,
                                      r2=r22)
    else:
        q, m, r2i = _linreg(ih1, iv1)
        if r2i >= sig_r2_inv:
            t0_, lapse_, t1_ = q, m, q + m * h1
        else:
            t0_, lapse_, t1_ = int_v[0], 0.0, int_v[0]
        q, m, r2i2 = _linreg(ih2, iv2)
        if r2i2 >= sig_r2:
            slope = min(m, 0.0)
            cross = _intersect(t0_, lapse_, q, slope)
            if cross is not None and cross[0] > 40.0:
                x, y = cross
                return OrographyLapse(valid=True,
                                      inversion_significant=True,
                                      h0=h0, h1=x, t0=t0_, t1=y,
                                      inversion_lapse=lapse_, slope=slope,
                                      r2=r22)
        else:
            return OrographyLapse(valid=True, inversion_significant=True,
                                  h0=h0, h1=h1, t0=t0_, t1=t1_,
                                  inversion_lapse=lapse_,
                                  slope=climate_lapse_rate, r2=r22)

    # fall-through: plain regression on everything
    # (interpolation.cpp:790-796)
    return generic()


def orography_trend(lapse: OrographyLapse, z):
    """Detrend/retrend value of the piecewise lapse at height z
    (detrendPoints height branch, interpolation.cpp:1255-1274; retrend
    :1330-1343). Works on numpy or jnp arrays."""
    xp = jnp if isinstance(z, jax.Array) else __import__("numpy")
    if not lapse.valid:
        return xp.zeros_like(z)
    if lapse.inversion_significant:
        below = xp.maximum(z - lapse.h0, 0.0) * lapse.inversion_lapse
        above = (lapse.h1 - lapse.h0) * lapse.inversion_lapse \
            + (z - lapse.h1) * lapse.slope
        return xp.where(z <= lapse.h1, below, above)
    return xp.maximum(z, 0.0) * lapse.slope


def idw_map(station_x, station_y, station_value, grid_x, grid_y,
            active=None):
    """IDW of station values onto (R, C) coordinate maps.

    Weight = 1 / (d / 10 km)^3 (inverseDistanceWeighted,
    interpolation.cpp:1040-1046); a station within EPSILON of a cell centre
    dominates via the distance floor.
    """
    sx = jnp.asarray(station_x, jnp.float64)
    sy = jnp.asarray(station_y, jnp.float64)
    sv = jnp.asarray(station_value, jnp.float64)
    ok = sv != NODATA
    if active is not None:
        ok = ok & active

    def body(carry, inputs):
        s_sum, w_sum = carry
        x, y, v, valid = inputs
        dist = jnp.sqrt((grid_x - x) ** 2 + (grid_y - y) ** 2)
        dist = jnp.maximum(dist, EPSILON)
        d_km = dist / 10000.0
        w = 1.0 / (d_km * d_km * d_km)
        w = jnp.where(valid, w, 0.0)
        return (s_sum + v * w, w_sum + w), None

    init = (jnp.zeros_like(grid_x), jnp.zeros_like(grid_x))
    (s_sum, w_sum), _ = lax.scan(body, init, (sx, sy, sv, ok))
    return jnp.where(w_sum > 0, s_sum / jnp.maximum(w_sum, 1e-30), NODATA)


@dataclasses.dataclass(frozen=True)
class ProxyResult:
    slope: jax.Array
    intercept: jax.Array
    r2: jax.Array
    significant: jax.Array


def detrended_idw(station_x, station_y, station_z, station_value,
                  grid_x, grid_y, grid_z, *,
                  kind: VariableKind = VariableKind.GENERIC,
                  min_regression_r2: float = 0.1,
                  rainfall_threshold: float = 0.2,
                  extra_station_proxies=(), extra_grid_proxies=(),
                  elevation_lapse: OrographyLapse | None = None,
                  active=None):
    """Detrended IDW of one variable onto the DEM.

    1. regress station values against elevation (+ optional extra proxies);
    2. subtract the significant trends from station values (detrendPoints,
       interpolation.cpp:1236-1280);
    3. IDW the residuals;
    4. add the trends back at the grid cells (retrend);
    5. variable-specific clamping.

    ``elevation_lapse`` (an :class:`OrographyLapse` from
    :func:`regression_orography_t`) replaces the simple linear elevation
    regression with the thermal-inversion piecewise lapse — the
    useThermalInversion path of the reference (retrend,
    interpolation.cpp:1330-1343).

    Returns ``(map, ProxyResult for elevation)``.
    """
    sv = jnp.asarray(station_value, jnp.float64)
    sz = jnp.asarray(station_z, jnp.float64)
    ok = sv != NODATA
    if active is not None:
        ok = ok & jnp.asarray(active)

    # precipitation all-zero shortcut (interpolate, interpolation.cpp:2506)
    if kind == VariableKind.PRECIPITATION:
        all_zero = jnp.sum(jnp.where(ok, jnp.abs(sv), 0.0)) <= 0.0
    else:
        all_zero = jnp.asarray(False)

    proxies = [(sz, jnp.asarray(grid_z, jnp.float64))]
    for sp, gp in zip(extra_station_proxies, extra_grid_proxies):
        proxies.append((jnp.asarray(sp, jnp.float64), jnp.asarray(gp, jnp.float64)))

    residual = sv
    trend_grid = jnp.zeros_like(jnp.asarray(grid_z, jnp.float64))
    elev_result = None
    detrendable = kind in (VariableKind.TEMPERATURE, VariableKind.GENERIC,
                           VariableKind.RELATIVE_HUMIDITY)
    for i, (sp, gp) in enumerate(proxies):
        if i == 0 and elevation_lapse is not None and detrendable:
            # thermal-inversion piecewise lapse for the elevation proxy
            trend_st = orography_trend(elevation_lapse, sp)
            residual = jnp.where(ok, residual - trend_st, NODATA)
            trend_grid = trend_grid + orography_trend(elevation_lapse, gp)
            elev_result = ProxyResult(
                jnp.asarray(elevation_lapse.slope, jnp.float64),
                jnp.asarray(0.0, jnp.float64),
                jnp.asarray(elevation_lapse.r2, jnp.float64),
                jnp.asarray(elevation_lapse.valid))
            continue
        slope, intercept, r2 = simple_regression(residual, sp, ok)
        significant = r2 >= min_regression_r2
        if not detrendable:
            significant = jnp.asarray(False)
        residual = jnp.where(significant & ok, residual - (intercept + slope * sp),
                             residual)
        residual = jnp.where(ok, residual, NODATA)
        trend_grid = trend_grid + jnp.where(significant,
                                            intercept + slope * gp, 0.0)
        if i == 0:
            elev_result = ProxyResult(slope, intercept, r2, significant)

    result = idw_map(station_x, station_y, residual, grid_x, grid_y, active=ok)
    result = jnp.where(result != NODATA, result + trend_grid, NODATA)

    # post-processing (interpolation.cpp:2540-2560)
    if kind == VariableKind.PRECIPITATION:
        result = jnp.where(result < rainfall_threshold, 0.0, result)
        result = jnp.where(all_zero, 0.0, result)
    elif kind == VariableKind.RELATIVE_HUMIDITY:
        result = jnp.clip(result, 0.0, 100.0)
    elif kind == VariableKind.NON_NEGATIVE:
        result = jnp.maximum(result, 0.0)

    return result, elev_result


SHEPARD_MIN_NRPOINTS = 5    # interpolationConstants.h:7-9
SHEPARD_AVG_NRPOINTS = 8
SHEPARD_MAX_NRPOINTS = 10


def _shepard_initial_radius(bbox_area, n_points, avg_points):
    """computeShepardInitialRadius (interpolation.cpp:800-804)."""
    return jnp.sqrt((avg_points * bbox_area) / (jnp.pi * n_points))


def shepard_idw_map(station_x, station_y, station_value, grid_x, grid_y,
                    *, active=None, modified: bool = False):
    """Shepard (1968) interpolation with direction factors, vectorized over
    the whole grid.

    Mirrors shepardIdw / modifiedShepardIdw (interpolation.cpp:871-1029):
    per cell, the neighbourhood is the stations within the density-derived
    initial radius, clamped to [5, 10] nearest (shepardSearchNeighbour,
    :806-869); distance kernel S_i is 1/d inside r/3 and the (27/4r)
    quadratic taper outside (classic) or (r-d)/(r d) (modified); weights are
    S_i^2 (1 + t_i) with the directional isolation factor t_i.

    The per-cell dynamic neighbour search becomes a fixed-k `top_k` plus
    masks — the same selection rule, expressed with static shapes.
    """
    sx = jnp.asarray(station_x, jnp.float64)
    sy = jnp.asarray(station_y, jnp.float64)
    sv = jnp.asarray(station_value, jnp.float64)
    ok = sv != NODATA
    if active is not None:
        ok = ok & jnp.asarray(active)
    n_st = sv.shape[0]
    k = min(n_st, SHEPARD_MAX_NRPOINTS)

    n_ok = jnp.maximum(jnp.sum(ok), 1)
    bbox_area = ((jnp.max(jnp.where(ok, sx, -jnp.inf))
                  - jnp.min(jnp.where(ok, sx, jnp.inf)))
                 * (jnp.max(jnp.where(ok, sy, -jnp.inf))
                    - jnp.min(jnp.where(ok, sy, jnp.inf))))
    r0 = _shepard_initial_radius(jnp.maximum(bbox_area, 1.0), n_ok,
                                 SHEPARD_AVG_NRPOINTS)

    gshape = jnp.asarray(grid_x).shape
    gx = jnp.asarray(grid_x, jnp.float64).ravel()
    gy = jnp.asarray(grid_y, jnp.float64).ravel()

    def per_cell(cx, cy):
        d = jnp.sqrt((sx - cx) ** 2 + (sy - cy) ** 2)
        d = jnp.where(ok & (d > 0), d, jnp.inf)
        neg_d, idx = lax.top_k(-d, k)
        nd = -neg_d                                  # ascending
        rank = jnp.arange(k)
        n_inside = jnp.sum(nd <= r0)
        # < 5 inside: take the 5 nearest; > 10 inside: the 10 nearest;
        # else: all inside the initial radius (shepardSearchNeighbour)
        radius = jnp.where(
            n_inside < SHEPARD_MIN_NRPOINTS,
            nd[jnp.minimum(SHEPARD_MIN_NRPOINTS, k) - 1] + EPSILON,
            jnp.where(n_inside > SHEPARD_MAX_NRPOINTS, nd[k - 1] + EPSILON, r0))
        sel = jnp.where(
            n_inside < SHEPARD_MIN_NRPOINTS, rank < SHEPARD_MIN_NRPOINTS,
            jnp.where(n_inside > SHEPARD_MAX_NRPOINTS, rank < k, nd <= r0))
        sel = sel & jnp.isfinite(nd)

        if modified:
            s = jnp.where(sel & (nd <= radius),
                          (radius - nd) / (radius * jnp.maximum(nd, EPSILON)),
                          0.0)
        else:
            r3 = radius / 3.0
            taper = (6.75 / radius) * ((nd / radius) - 1.0) ** 2
            s = jnp.where(sel,
                          jnp.where(nd <= r3, 1.0 / jnp.maximum(nd, EPSILON),
                                    jnp.where(nd <= radius, taper, 0.0)),
                          0.0)
        s_sum = jnp.sum(s)

        # directional isolation factor t_i (interpolation.cpp:911-927)
        px = sx[idx]
        py = sy[idx]
        cos_ij = (((cx - px)[:, None] * (cx - px)[None, :]
                   + (cy - py)[:, None] * (cy - py)[None, :])
                  / jnp.maximum(nd[:, None] * nd[None, :], EPSILON))
        off_diag = ~jnp.eye(k, dtype=bool)
        t = jnp.sum(jnp.where(off_diag, s[None, :] * (1.0 - cos_ij), 0.0),
                    axis=1) / jnp.maximum(s_sum, 1e-30)
        wgt = s * s * (1.0 + t)
        w_sum = jnp.sum(wgt)
        est = jnp.sum(wgt * sv[idx]) / jnp.maximum(w_sum, 1e-30)
        return jnp.where(w_sum > 0, est, NODATA)

    flat = jax.vmap(per_cell)(gx, gy)
    return flat.reshape(gshape)


def quality_range_check(value, vmin, vmax):
    """Gross-range quality control (Crit3DQuality, quality.h:41-94):
    NODATA outside the plausible physical range."""
    v = jnp.asarray(value, jnp.float64)
    ok = (v >= vmin) & (v <= vmax) & (v != NODATA)
    return jnp.where(ok, v, NODATA), ok


def spatial_quality_control(station_x, station_y, station_z, station_value,
                            *, kind: VariableKind = VariableKind.TEMPERATURE,
                            n_neighbours: int = 10, n_std_dev: float = 2.0,
                            min_regression_r2: float = 0.1):
    """Leave-one-out spatial consistency check.

    Mirrors spatialQualityControl (spatialControl.cpp:336-430): each station
    is re-estimated from the others (detrended IDW at its own location); the
    residual is compared against a variable-specific threshold built from
    the neighbourhood standard deviation, elevation difference and distance
    (getSpatialThresholdVar, spatialControl.cpp:14-60). Returns a bool mask
    of accepted stations.
    """
    sx = jnp.asarray(station_x, jnp.float64)
    sy = jnp.asarray(station_y, jnp.float64)
    sz = jnp.asarray(station_z, jnp.float64)
    sv = jnp.asarray(station_value, jnp.float64)
    n = sv.shape[0]
    valid = sv != NODATA

    # pairwise distances with self-distance masked out
    dx = sx[:, None] - sx[None, :]
    dy = sy[:, None] - sy[None, :]
    dist = jnp.sqrt(dx ** 2 + dy ** 2)
    eye = jnp.eye(n, dtype=bool)
    other = (~eye) & valid[None, :]

    # leave-one-out detrended estimate at each station
    slope, intercept, r2 = simple_regression(sv, sz, valid)
    detrendable = kind in (VariableKind.TEMPERATURE, VariableKind.GENERIC,
                           VariableKind.RELATIVE_HUMIDITY)
    significant = (r2 >= min_regression_r2) & detrendable
    resid = jnp.where(significant, sv - (intercept + slope * sz), sv)

    d_km = jnp.where(other, jnp.maximum(dist, EPSILON), jnp.inf) / 10000.0
    w = 1.0 / (d_km ** 3)
    est_resid = jnp.sum(jnp.where(other, w * resid[None, :], 0.0), axis=1) \
        / jnp.maximum(jnp.sum(jnp.where(other, w, 0.0), axis=1), 1e-30)
    est = jnp.where(significant, est_resid + intercept + slope * sz, est_resid)
    residual = sv - est

    # neighbourhood statistics over the nearest n_neighbours stations
    big = jnp.where(other, dist, jnp.inf)
    order = jnp.argsort(big, axis=1)[:, :n_neighbours]
    nb_vals = jnp.take(sv, order)
    nb_z = jnp.take(sz, order)
    nb_dist = jnp.take_along_axis(big, order, axis=1)
    nb_ok = jnp.isfinite(nb_dist)
    cnt = jnp.maximum(jnp.sum(nb_ok, axis=1), 1)
    mean = jnp.sum(jnp.where(nb_ok, nb_vals, 0.0), axis=1) / cnt
    var = jnp.sum(jnp.where(nb_ok, (nb_vals - mean[:, None]) ** 2, 0.0),
                  axis=1) / cnt
    std_dev = jnp.sqrt(var)
    avg_dz = jnp.sum(jnp.where(nb_ok, jnp.abs(nb_z - sz[:, None]), 0.0),
                     axis=1) / cnt
    min_dist = jnp.min(jnp.where(nb_ok, nb_dist, jnp.inf), axis=1)

    std_dev = jnp.maximum(std_dev, jnp.abs(sv) / 100.0)
    if kind == VariableKind.TEMPERATURE:
        thr = jnp.minimum(
            jnp.minimum(min_dist / 1000.0 + 1.0 + avg_dz / 100.0, 12.0)
            + std_dev * n_std_dev, 15.0)
    elif kind == VariableKind.RELATIVE_HUMIDITY:
        thr = 20.0 + avg_dz / 10.0 + min_dist / 1000.0 + std_dev * n_std_dev
    elif kind == VariableKind.PRECIPITATION:
        dist_w = jnp.maximum(1.0, min_dist / 2000.0)
        thr = jnp.where(sv <= 0.2,
                        jnp.maximum(5.0, dist_w + std_dev * (n_std_dev + 1)),
                        1000.0)
    else:
        thr = 10.0 + std_dev * n_std_dev

    return valid & (jnp.abs(residual) <= thr)
