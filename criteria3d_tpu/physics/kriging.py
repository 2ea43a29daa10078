"""Ordinary kriging with variogram estimation.

TPU-native re-expression of the reference kriging library
(agrolib/interpolation/kriging.cpp, Chao-yi Lang 1995): the reference builds
the (n+1) ordinary-kriging system with a hand-rolled Gauss-Jordan inversion
and solves the weights **per target point** (krigingSetWeight,
kriging.cpp:205-265). Here the system is factorized once and the weights for
*all* grid cells are obtained with a single batched solve — one matmul-shaped
program instead of a per-cell loop.

Variogram models exactly as kriging.cpp:160-192 (spherical / exponential
with -3h/r / gaussian with -4(h/r)^2 / linear). The empirical-variogram
estimation that the reference declares but never implements
(krigingEstimateVariogram, interpolation.h:72) is provided: binned
semivariance + weighted least-squares model fit, best-of-four selection.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from criteria3d_tpu.constants import NODATA

__all__ = ["VariogramModel", "variogram", "empirical_variogram",
           "fit_variogram", "ordinary_kriging"]

SPHERICAL, EXPONENTIAL, GAUSSIAN, LINEAR = 1, 2, 3, 4
_MODE_NAMES = {SPHERICAL: "spherical", EXPONENTIAL: "exponential",
               GAUSSIAN: "gaussian", LINEAR: "linear"}


@dataclasses.dataclass(frozen=True)
class VariogramModel:
    mode: int            # TkrigingMode (interpolationConstants.h:51-55)
    nugget: float
    sill: float
    range_: float
    slope: float = 0.0

    @property
    def name(self):
        return _MODE_NAMES[self.mode]


def variogram(h, model: VariogramModel):
    """gamma(h) for each model (kriging.cpp:160-192)."""
    h = jnp.asarray(h, jnp.float64)
    t = h / model.range_
    sn = model.sill - model.nugget
    if model.mode == SPHERICAL:
        g = jnp.where(h < model.range_,
                      model.nugget + sn * (1.5 * t - 0.5 * t ** 3),
                      model.nugget + sn)
    elif model.mode == EXPONENTIAL:
        g = model.nugget + sn * (1.0 - jnp.exp(-3.0 * t))
    elif model.mode == GAUSSIAN:
        g = model.nugget + sn * (1.0 - jnp.exp(-4.0 * t * t))
    else:
        g = model.nugget + model.slope * h
    return g


def empirical_variogram(station_x, station_y, station_value, *,
                        n_bins: int = 12, max_distance: float | None = None,
                        active=None):
    """Binned semivariance 0.5 * mean (v_i - v_j)^2 over station pairs.

    Returns (bin_centres, gamma, pair_counts); empty bins carry NODATA.
    """
    sx = jnp.asarray(station_x, jnp.float64)
    sy = jnp.asarray(station_y, jnp.float64)
    sv = jnp.asarray(station_value, jnp.float64)
    ok = sv != NODATA
    if active is not None:
        ok = ok & jnp.asarray(active)

    d = jnp.sqrt((sx[:, None] - sx[None, :]) ** 2
                 + (sy[:, None] - sy[None, :]) ** 2)
    dv2 = 0.5 * (sv[:, None] - sv[None, :]) ** 2
    pair = ok[:, None] & ok[None, :] & (d > 0)
    if max_distance is None:
        max_distance = float(jnp.max(jnp.where(pair, d, 0.0))) * 0.75
    width = max_distance / n_bins
    bin_idx = jnp.clip((d / width).astype(jnp.int32), 0, n_bins - 1)
    in_range = pair & (d <= max_distance)

    counts = jnp.zeros(n_bins).at[bin_idx].add(in_range.astype(jnp.float64))
    sums = jnp.zeros(n_bins).at[bin_idx].add(jnp.where(in_range, dv2, 0.0))
    gamma = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), NODATA)
    centres = (jnp.arange(n_bins) + 0.5) * width
    return centres, gamma, counts / 2.0   # pairs counted twice


def fit_variogram(h, gamma, counts=None, modes=(SPHERICAL, EXPONENTIAL,
                                                GAUSSIAN, LINEAR),
                  n_grid: int = 24) -> VariogramModel:
    """Pick the (mode, nugget, sill, range/slope) minimising the
    count-weighted SSE against the empirical variogram.

    Grid search over range with closed-form (nugget, sill) per candidate —
    the whole candidate sweep evaluates as one batched array program.
    """
    h = jnp.asarray(h, jnp.float64)
    g = jnp.asarray(gamma, jnp.float64)
    ok = g != NODATA
    w = jnp.where(ok, 1.0 if counts is None else jnp.asarray(counts, jnp.float64), 0.0)
    hmax = float(jnp.max(jnp.where(ok, h, 0.0)))
    ranges = jnp.linspace(hmax / n_grid, hmax * 1.5, n_grid)

    def basis(mode, r):
        t = h / r
        if mode == SPHERICAL:
            return jnp.where(h < r, 1.5 * t - 0.5 * t ** 3, 1.0)
        if mode == EXPONENTIAL:
            return 1.0 - jnp.exp(-3.0 * t)
        if mode == GAUSSIAN:
            return 1.0 - jnp.exp(-4.0 * t * t)
        return h  # linear: basis is h itself, "range" unused

    best = None
    for mode in modes:
        def sse_of(r, mode=mode):
            b = basis(mode, r)
            # weighted LSQ of g ~ nugget + c * b  (c = sill - nugget or slope)
            sw = jnp.maximum(jnp.sum(w), 1e-30)
            mb = jnp.sum(w * b) / sw
            mg = jnp.sum(w * g * ok) / sw
            sbb = jnp.sum(w * (b - mb) ** 2)
            sbg = jnp.sum(w * (b - mb) * (jnp.where(ok, g, 0.0) - mg))
            c = jnp.where(sbb > 0, sbg / jnp.maximum(sbb, 1e-30), 0.0)
            c = jnp.maximum(c, 0.0)
            nug = jnp.maximum(mg - c * mb, 0.0)
            res = jnp.where(ok, g - (nug + c * b), 0.0)
            return jnp.sum(w * res * res), nug, c

        if mode == LINEAR:
            sse, nug, c = sse_of(jnp.asarray(1.0))
            cand = (float(sse), VariogramModel(mode, float(nug), float(nug),
                                               1.0, slope=float(c)))
        else:
            sses, nugs, cs = jax.vmap(sse_of)(ranges)
            i = int(jnp.argmin(sses))
            cand = (float(sses[i]),
                    VariogramModel(mode, float(nugs[i]),
                                   float(nugs[i] + cs[i]), float(ranges[i])))
        if best is None or cand[0] < best[0]:
            best = cand
    return best[1]


def ordinary_kriging(station_x, station_y, station_value, grid_x, grid_y,
                     model: VariogramModel, *, active=None):
    """Ordinary-kriging map: one factorization, batched weight solve.

    System layout identical to krigingVariogram (kriging.cpp:141-196):
    V[i,j] = gamma(d_ij) with a Lagrange row/col of ones; right-hand sides
    D[:, cell] = gamma(d(station, cell)), 1. Inactive stations are removed
    by collapsing their rows to the identity (zero weight).
    """
    sx = jnp.asarray(station_x, jnp.float64)
    sy = jnp.asarray(station_y, jnp.float64)
    sv = jnp.asarray(station_value, jnp.float64)
    ok = sv != NODATA
    if active is not None:
        ok = ok & jnp.asarray(active)
    n = sv.shape[0]

    d = jnp.sqrt((sx[:, None] - sx[None, :]) ** 2
                 + (sy[:, None] - sy[None, :]) ** 2)
    V = jnp.zeros((n + 1, n + 1), jnp.float64)
    pair = ok[:, None] & ok[None, :]
    V = V.at[:n, :n].set(jnp.where(pair, variogram(d, model), 0.0))
    V = V.at[:n, n].set(jnp.where(ok, 1.0, 0.0))
    V = V.at[n, :n].set(jnp.where(ok, 1.0, 0.0))
    # inactive stations: identity rows -> weight forced to 0
    diag_fix = jnp.where(jnp.concatenate([~ok, jnp.zeros(1, bool)]), 1.0, 0.0)
    V = V + jnp.diag(diag_fix)

    gshape = jnp.asarray(grid_x).shape
    gx = jnp.asarray(grid_x, jnp.float64).ravel()
    gy = jnp.asarray(grid_y, jnp.float64).ravel()
    dg = jnp.sqrt((sx[:, None] - gx[None, :]) ** 2
                  + (sy[:, None] - gy[None, :]) ** 2)
    D = jnp.concatenate([jnp.where(ok[:, None], variogram(dg, model), 0.0),
                         jnp.ones((1, gx.shape[0]))], axis=0)

    W = jnp.linalg.solve(V, D)                       # (n+1, n_cells)
    est = jnp.where(ok, sv, 0.0) @ W[:n]
    return est.reshape(gshape)
