"""Nonlinear function fitting for proxy detrending.

TPU-native analogue of the reference's Marquardt machinery
(agrolib/mathFunctions/furtherMathFunctions.cpp): the piecewise lapse-rate
functions used for the elevation proxy (lapseRatePiecewise_two/_three/
_three_free, furtherMathFunctions.cpp:115-180) and a Levenberg-Marquardt
fitter (bestFittingMarquardt_nDimension) re-designed as a *batched* solver:

- residual Jacobians come from `jax.jacfwd` instead of finite differences;
- the reference restarts Marquardt from a grid of first-guess parameter
  combinations sequentially (calculateFirstGuessCombinations,
  interpolation.cpp:1557-1620); here every start runs **in parallel** under
  `vmap` and the best (lowest SSE) wins — same global-search intent, one
  batched TPU program;
- stations are fixed-size masked arrays so the whole fit jits once.

For the non-elevation proxies the reference fits ``functionLinear_intercept``
(par0*x + par1) summed over proxies with the same Marquardt loop
(multipleDetrendingOtherProxiesFitting, interpolation.cpp:2137-2141); the
exact minimiser of that objective is weighted linear least squares, provided
in closed form (`weighted_multilinear`).
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "lapse_piecewise_two", "lapse_piecewise_three", "lapse_piecewise_three_free",
    "linear_intercept", "levenberg_marquardt", "best_fitting_marquardt",
    "first_guess_grid", "weighted_multilinear",
]


def lapse_piecewise_two(x, p):
    """Two-piece lapse line through A(p0, p1); slopes p2 below, p3 above
    (lapseRatePiecewise_two, furtherMathFunctions.cpp:115-132)."""
    return jnp.where(x < p[0], p[2] * (x - p[0]) + p[1], p[3] * (x - p[0]) + p[1])


def lapse_piecewise_three(x, p):
    """Three-piece: knees at p0 and p0+p2 (p2 >= 10 m), middle slope p3,
    outer slope p4 (lapseRatePiecewise_three, furtherMathFunctions.cpp:134-147)."""
    dx = jnp.maximum(10.0, p[2])
    xb = p[0] + dx
    lo = p[4] * x - p[0] * p[4] + p[1]
    hi = p[4] * x - p[4] * p[0] - p[4] * dx + p[3] * dx + p[1]
    mid = p[3] * x - p[3] * p[0] + p[1]
    return jnp.where(x < p[0], lo, jnp.where(x > xb, hi, mid))


def lapse_piecewise_three_free(x, p):
    """Three-piece with free outer slopes p4 (below) and p5 (above)
    (lapseRatePiecewise_three_free, furtherMathFunctions.cpp:149-180)."""
    dx = jnp.maximum(10.0, p[2])
    xb = p[0] + dx
    lo = p[4] * x - p[0] * p[4] + p[1]
    hi = p[5] * x - p[5] * p[0] - p[5] * dx + p[3] * dx + p[1]
    mid = p[3] * x - p[3] * p[0] + p[1]
    return jnp.where(x < p[0], lo, jnp.where(x > xb, hi, mid))


def linear_intercept(x, p):
    """functionLinear_intercept (furtherMathFunctions.cpp:198-201)."""
    return p[0] * x + p[1]


ELEVATION_FUNCTIONS = {
    "double_piecewise": (lapse_piecewise_two, 4),
    "triple_piecewise": (lapse_piecewise_three, 5),
    "free_triple_piecewise": (lapse_piecewise_three_free, 6),
}


def _weighted_sse(func, params, x, y, w):
    r = func(x, params) - y
    return jnp.sum(w * r * r)


@functools.partial(jax.jit, static_argnums=(0, 6))
def levenberg_marquardt(func, p0, pmin, pmax, x, y, n_iter=60, w=None):
    """Fixed-iteration Levenberg-Marquardt of ``func(x, params) ~ y``.

    ``x, y, w`` are fixed-size arrays; invalid stations carry ``w == 0``.
    Parameters are clipped to [pmin, pmax] after every accepted step — the
    box-constraint behaviour of the reference fitter. Returns ``(params, sse)``.
    """
    if w is None:
        w = jnp.ones_like(y)
    p0 = jnp.clip(jnp.asarray(p0, jnp.float64), pmin, pmax)

    def residual(p):
        return jnp.sqrt(w) * (func(x, p) - y)

    def body(carry, _):
        p, lam, best_sse = carry
        r = residual(p)
        J = jax.jacfwd(residual)(p)
        JtJ = J.T @ J
        g = J.T @ r
        A = JtJ + lam * jnp.diag(jnp.diag(JtJ)) + 1e-12 * jnp.eye(p.shape[0])
        step = jnp.linalg.solve(A, -g)
        p_new = jnp.clip(p + step, pmin, pmax)
        sse_new = _weighted_sse(func, p_new, x, y, w)
        improved = sse_new < best_sse
        p = jnp.where(improved, p_new, p)
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-8, 1e8)
        best_sse = jnp.minimum(best_sse, sse_new)
        return (p, lam, best_sse), None

    sse0 = _weighted_sse(func, p0, x, y, w)
    (p, _, sse), _ = lax.scan(body, (p0, jnp.asarray(1e-2), sse0), None,
                              length=n_iter)
    return p, sse


def first_guess_grid(pmin, pmax, steps_per_param=None):
    """Grid of first-guess parameter combinations over the box [pmin, pmax]
    (calculateFirstGuessCombinations analogue). Returns (n_starts, n_params)."""
    pmin = jnp.asarray(pmin, jnp.float64)
    pmax = jnp.asarray(pmax, jnp.float64)
    n = pmin.shape[0]
    if steps_per_param is None:
        steps_per_param = {4: 5, 5: 4, 6: 3}.get(n, 3)
    axes = [jnp.linspace(pmin[i], pmax[i], steps_per_param) for i in range(n)]
    combos = list(itertools.product(*(range(steps_per_param) for _ in range(n))))
    grid = jnp.stack([jnp.array([axes[i][c[i]] for i in range(n)])
                      for c in combos])
    return grid


def best_fitting_marquardt(func, pmin, pmax, x, y, w=None, *,
                           first_guesses=None, n_iter=60):
    """LM from every first-guess start **in parallel**; best SSE wins.

    Replaces bestFittingMarquardt_nDimension's sequential multi-start loop
    with one `vmap` — the batched-TPU expression of the same search.
    Returns ``(params, r2)``.
    """
    x = jnp.asarray(x, jnp.float64)
    y = jnp.asarray(y, jnp.float64)
    if w is None:
        w = jnp.ones_like(y)
    w = jnp.asarray(w, jnp.float64)
    pmin = jnp.asarray(pmin, jnp.float64)
    pmax = jnp.asarray(pmax, jnp.float64)
    if first_guesses is None:
        first_guesses = first_guess_grid(pmin, pmax)

    fit = jax.vmap(lambda p0: levenberg_marquardt(func, p0, pmin, pmax,
                                                  x, y, n_iter, w))
    params_all, sse_all = fit(first_guesses)
    best = jnp.argmin(sse_all)
    params = params_all[best]
    sse = sse_all[best]

    wsum = jnp.maximum(jnp.sum(w), 1e-30)
    ybar = jnp.sum(w * y) / wsum
    sstot = jnp.maximum(jnp.sum(w * (y - ybar) ** 2), 1e-30)
    r2 = 1.0 - sse / sstot
    return params, r2


def weighted_multilinear(X, y, w):
    """Weighted least squares of ``y ~ X @ slopes + intercept``.

    Closed-form minimiser of the reference's summed linear_intercept objective
    for the non-elevation proxies. ``X``: (n_points, n_proxies). Returns
    ``(slopes, intercept)``.
    """
    X = jnp.asarray(X, jnp.float64)
    y = jnp.asarray(y, jnp.float64)
    w = jnp.asarray(w, jnp.float64)
    A = jnp.concatenate([X, jnp.ones((X.shape[0], 1), X.dtype)], axis=1)
    Aw = A * w[:, None]
    M = A.T @ Aw + 1e-10 * jnp.eye(A.shape[1])
    b = Aw.T @ y
    sol = jnp.linalg.solve(M, b)
    return sol[:-1], sol[-1]
