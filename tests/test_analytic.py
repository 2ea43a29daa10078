"""Analytic Richards oracles (SURVEY §4 oracle (a)).

Every other correctness surface in this suite is either behavioral or a
cross-implementation comparison in which BOTH sides are driven over the
same builder-generated node graph (tests/golden/export_topology.py) — a
shared bug in the graph builder itself would be invisible to all of them.
These tests close that gap: the grid is built through the normal
``Grid.build`` path and the steady solution is compared against
closed-form / independently integrated continuum solutions of Richards'
equation.  All soil hydraulic functions used by the oracles are
re-implemented here in plain numpy from the textbook formulas (van
Genuchten 1980, Mualem 1976), sharing no code with
``criteria3d_tpu.core.soil``.

Oracles:

1. **Unit-gradient steady drainage** — constant rain flux ``q < Ksat``
   over a freely draining column has the exact steady solution
   ``psi(z) = K^-1(q)`` uniform over the profile (dpsi/dz = 0, Darcy
   flux purely gravitational).  This solution satisfies the CONTINUUM
   equation and the DISCRETE node balances exactly (log-mean of equal
   conductivities is the conductivity; free drainage is the same unit
   gradient, water.cpp:614-618), so the assertion tolerance is solver
   convergence noise, not discretisation error.
2. **Steady flux to a water table** — with a prescribed-total-potential
   boundary below the column, the steady profile solves the ODE
   ``dpsi/dz = q/K(psi) - 1`` (Darcy + continuity), integrated here with
   ``scipy.solve_ivp`` at tolerances far below the discretisation error.
   The model profile must match within an O(dz^2) bound, and the error
   must shrink under grid refinement (the convergence assertion is what
   guards the scheme's consistency — a wrong-but-stable discretisation
   would pass a fixed tolerance at one resolution).

Reference context: the reference ships no analytic solver tests (SURVEY
§4); its acceptance criterion is the mass-balance ratio machinery
(water.cpp:96-156).  These are the infiltration-column benchmarks named
as oracle (a) in SURVEY §4.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp
from scipy.optimize import brentq

from criteria3d_tpu import (Grid, SoilFields, SolverParameters, WaterState,
                            compute_period)
from criteria3d_tpu.core.grid import BoundaryType
from criteria3d_tpu.core.soil import WRCModel
from criteria3d_tpu.solver.step import initialize_balance

# ----------------------------------------------------------------------
# independent textbook soil functions (numpy; loam-like parameters)
ALPHA = 3.6      # [1/m]
N = 1.56
M = 1.0 - 1.0 / N
THETA_S = 0.43
THETA_R = 0.078
K_SAT = 2.9e-6   # [m/s]  (~0.25 m/day)
CELL = 2.0       # [m] DEM cell size
AREA = CELL * CELL


def se_of_psi(psi):
    """van Genuchten 1980, eq. 21; psi is the matric potential [m] <= 0."""
    psi = np.asarray(psi, dtype=float)
    return np.where(psi >= 0.0, 1.0,
                    (1.0 + (ALPHA * np.abs(psi)) ** N) ** (-M))


def k_of_psi(psi):
    """Mualem 1976 / van Genuchten 1980, eq. 8 with tortuosity L = 0.5."""
    se = np.clip(se_of_psi(psi), 1e-12, 1.0)
    term = 1.0 - (1.0 - se ** (1.0 / M)) ** M
    return K_SAT * np.sqrt(se) * term * term


def log_mean(a, b):
    if np.isclose(a, b):
        return a
    return (a - b) / np.log(a / b)


def psi_for_flux(q):
    """Invert K(psi) = q: the unit-gradient matric potential."""
    return brentq(lambda p: k_of_psi(p) - q, -50.0, -1e-9, xtol=1e-14)


def spin_z0(grid):
    return float(grid.z[0, 0, 0])


# ----------------------------------------------------------------------
def build_column(total_depth=1.0, dz=0.02, *, free_drainage=True):
    """Single-cell DEM -> surface node + uniform dz soil column, built
    through the standard Grid.build path (the component under guard)."""
    dem = np.zeros((1, 1))
    soil = SoilFields.uniform((1, 1), vg_alpha=ALPHA, vg_n=N, vg_he=0.0,
                              theta_s=THETA_S, theta_r=THETA_R, k_sat=K_SAT)
    return Grid.build(dem, CELL, soil, total_depth=total_depth,
                      min_thickness=dz, max_thickness=dz,
                      free_catchment_runoff=False,
                      free_bottom_drainage=free_drainage,
                      free_lateral_drainage=False)


def run_steady(grid, params, psi_init, q, hours, surface_water=0.0):
    """Run ``hours`` of constant rain flux q [m/s] from ``psi_init``."""
    state = WaterState.initialize(
        grid, params, matric_potential=jnp.asarray(psi_init).reshape(-1, 1, 1),
        surface_water=surface_water)
    state = initialize_balance(grid, params, state)
    sink = jnp.zeros_like(state.sink_source).at[0, 0, 0].set(q * AREA)
    state = dataclasses.replace(state, sink_source=sink)
    for _ in range(hours):
        state = compute_period(grid, params, state, 3600.0)
    return state


# ----------------------------------------------------------------------
@pytest.mark.parametrize("fast", [False, True], ids=["f64", "fast_f32"])
def test_unit_gradient_steady_drainage(fast):
    """Exact closed form: steady rain q on a free-draining column =>
    psi = K^-1(q) everywhere; starting there the solver must hold it."""
    q = 0.3 * K_SAT
    psi_star = psi_for_flux(q)
    grid = build_column(total_depth=1.0, dz=0.04, free_drainage=True)
    params = (SolverParameters.fast_f32(wrc_model=WRCModel.VAN_GENUCHTEN)
              if fast else
              SolverParameters(wrc_model=WRCModel.VAN_GENUCHTEN))

    L = grid.n_layers
    psi0 = np.full(L, psi_star)
    # the steady surface pond depth is set by the infiltration-link
    # conductance; find it with a 2 h spin-up, then restart from the
    # CONSISTENT (pond, psi*) state — this avoids injecting a
    # pond-filling transient pulse whose advection out of the column
    # would otherwise dominate the runtime (measured: ~15 h to decay).
    spin = run_steady(grid, params, psi0, q, hours=2)
    pond = float(spin.h[0, 0, 0] - spin_z0(grid))
    state = run_steady(grid, params, psi0, q, hours=2, surface_water=pond)

    psi = np.asarray(state.h - grid.z)[1:, 0, 0]
    # exact discrete steady state: deviations are solver tolerance noise
    # (measured f64 residual after 2 h: ~1e-5 m)
    tol = 2e-3 if fast else 1e-4
    np.testing.assert_allclose(psi, psi_star, atol=tol)
    # the bottom boundary passed exactly the rain volume (2 h steady flux)
    bflow = float(jnp.sum(jnp.where(
        grid.btype == BoundaryType.FREE_DRAINAGE,
        state.boundary_flow_sum, 0.0)))
    assert bflow == pytest.approx(-q * AREA * 7200.0, rel=2e-2)
    assert abs(float(state.balance_whole.mbr)) < 1e-3


def test_unit_gradient_is_attracting():
    """Perturbed profiles must relax back toward the analytic steady
    state (guards sign conventions: a solver with, e.g., inverted gravity
    would be stable about a different profile)."""
    q = 0.3 * K_SAT
    psi_star = psi_for_flux(q)
    grid = build_column(total_depth=1.0, dz=0.04, free_drainage=True)
    params = SolverParameters(wrc_model=WRCModel.VAN_GENUCHTEN)

    L = grid.n_layers
    psi0 = psi_star + 0.08 * np.sin(
        np.linspace(0.5, 2.5 * np.pi, L))
    state = run_steady(grid, params, psi0, q, hours=6)

    psi = np.asarray(state.h - grid.z)[1:, 0, 0]
    err0 = float(np.abs(psi0[1:] - psi_star).max())
    err = float(np.abs(psi - psi_star).max())
    # measured decay: 0.08 -> ~4e-3 over 6 h
    assert err < err0 / 5.0, (err0, err)


def _water_table_oracle(grid, q):
    """Continuum steady profile above a prescribed-potential boundary.

    The bottom node's boundary link (water.cpp:737-760 semantics: virtual
    node Lb = 1 m below at the prescribed head, log-mean conductivity,
    saturated on the boundary side here) fixes psi_b from the flux balance
    logmean(Ksat, K(psi_b)) * (psi_b + Lb) / Lb = q; above it the profile
    solves dpsi/dz = q/K(psi) - 1.  Returns psi at every soil node centre.
    """
    z = np.asarray(grid.z)[:, 0, 0]
    z_b = z[-1]
    psi_b = brentq(
        lambda p: log_mean(K_SAT, k_of_psi(p)) * (p + 1.0) - q,
        -1.0 + 1e-9, -1e-9, xtol=1e-14)

    sol = solve_ivp(lambda _z, p: q / k_of_psi(p) - 1.0,
                    (z_b, z[1]), [psi_b], t_eval=z[1:][::-1],
                    rtol=1e-10, atol=1e-12, max_step=0.005)
    assert sol.success
    return sol.y[0][::-1], psi_b


def _water_table_error(dz, *, fast=False, hours=12):
    q = 0.2 * K_SAT
    grid = build_column(total_depth=1.0, dz=dz, free_drainage=False)
    L = grid.n_layers
    z_b = float(grid.z[L - 1, 0, 0])
    # water table exactly Lb = 1 m below the bottom node centre
    grid = grid.set_prescribed(L - 1, 0, 0, total_potential=z_b - 1.0)
    params = (SolverParameters.fast_f32(wrc_model=WRCModel.VAN_GENUCHTEN)
              if fast else
              SolverParameters(wrc_model=WRCModel.VAN_GENUCHTEN))

    psi_ref, psi_b = _water_table_oracle(grid, q)
    psi0 = np.concatenate([[psi_ref[0]], psi_ref])
    # pond spin-up + consistent restart (see test_unit_gradient_*)
    spin = run_steady(grid, params, psi0, q, hours=2)
    pond = float(spin.h[0, 0, 0] - spin_z0(grid))
    state = run_steady(grid, params, psi0, q, hours=hours,
                       surface_water=pond)

    psi = np.asarray(state.h - grid.z)[1:, 0, 0]
    # quasi-stationarity: one more hour moves the profile by far less
    # than the discretisation error we are about to measure (measured
    # drift at hour 12: ~5e-5 m/h both resolutions)
    state2 = compute_period(grid, params, state, 3600.0)
    drift = float(np.abs(np.asarray(state2.h - state.h)[1:, 0, 0]).max())
    assert drift < 2.5e-4, drift
    return float(np.abs(psi - psi_ref).max())


def test_water_table_profile_matches_continuum():
    """Steady percolation to a water table: the discrete steady profile
    matches the independently integrated continuum ODE, and the error
    CONVERGES under refinement (measured: 6.0e-3 m at dz=0.08 vs 2.1e-3
    at dz=0.04, largest just above the bottom boundary where the
    capillary curvature peaks)."""
    err_coarse = _water_table_error(dz=0.08)
    err_fine = _water_table_error(dz=0.04)
    assert err_fine < 3e-3, err_fine
    assert err_coarse < 1e-2, err_coarse
    # halving dz cuts the error ~2.9x (2nd-order interior + the
    # first-order one-sided boundary link); assert a factor that still
    # rules out a non-convergent (inconsistent) discretisation
    assert err_fine < err_coarse / 1.8, (err_coarse, err_fine)


def test_water_table_profile_fast_f32():
    """The production fast path against the same continuum oracle: the
    f32 psi-carry loop may add rounding-level noise but must sit inside
    the same discretisation-error envelope."""
    assert _water_table_error(dz=0.08, fast=True) < 1.2e-2
