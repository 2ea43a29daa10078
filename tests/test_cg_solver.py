"""Conjugate-gradient inner solver (SolverParameters.inner_solver="cg").

The analogue of the reference's optional "lineal" external CG/PCG bridge
(cpusolver.cpp:608-669, lineal/linealiaLib.h:9-97): same assembled system,
diagonal (Jacobi) preconditioning, solved by PCG instead of Jacobi sweeps.
Accuracy contract mirrors the fast-f32 one: identical fixed point (the
system is a symmetric M-matrix), so on a locked-dt trajectory heads match
the Jacobi path to well under a millimetre; free-running, the integral
quantities agree and the MBR gate still closes.
"""

import dataclasses

import numpy as np
import pytest

from criteria3d_tpu import SolverParameters, compute_period
from criteria3d_tpu.solver import water as W
from tests.test_fast_f32 import build


def test_tridiag_vertical_solve_against_dense():
    """The line preconditioner's batched Thomas elimination solves the
    vertical tridiagonal system exactly (checked against a dense solve
    per column)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    L, R, C = 7, 3, 2
    cu = np.zeros((L, R, C))
    cd = np.zeros((L, R, C))
    cu[1:] = rng.uniform(0, 0.45, (L - 1, R, C))
    cd[:-1] = rng.uniform(0, 0.45, (L - 1, R, C))
    rhs = rng.normal(size=(L, R, C))
    z = np.asarray(W.tridiag_vertical_solve(jnp.asarray(cu),
                                            jnp.asarray(cd),
                                            jnp.asarray(rhs)))
    for r in range(R):
        for c in range(C):
            T = np.eye(L)
            for l in range(1, L):
                T[l, l - 1] = -cu[l, r, c]
            for l in range(L - 1):
                T[l, l + 1] = -cd[l, r, c]
            np.testing.assert_allclose(T @ z[:, r, c], rhs[:, r, c],
                                       atol=1e-12)


@pytest.mark.parametrize("precond", ["diag", "line"])
@pytest.mark.parametrize("fast", [False, True], ids=["f64", "fast_f32"])
def test_cg_matches_jacobi_on_locked_trajectory(fast, precond):
    mk = SolverParameters.fast_f32 if fast else SolverParameters
    pj = mk(delta_t_min=60.0, delta_t_max=60.0)
    pc = mk(delta_t_min=60.0, delta_t_max=60.0, inner_solver="cg",
            cg_precond=precond)

    gj, sj = build(pj)
    gc, sc = build(pc)

    outj = compute_period(gj, pj, sj, 3600.0)
    outc = compute_period(gc, pc, sc, 3600.0)

    assert abs(float(outc.balance_whole.mbr)) < 2e-3
    psij = np.asarray(outj.matric_potential(gj))
    psic = np.asarray(outc.matric_potential(gc))
    mask = np.asarray(gj.mask)
    err = np.abs(psij - psic)[mask]
    assert err.max() < 1e-3, f"max psi error {err.max():.2e} m"


def test_cg_free_running_hydrology():
    pj = SolverParameters()
    pc = dataclasses.replace(pj, inner_solver="cg")

    gj, sj = build(pj)
    gc, sc = build(pc)

    outj = compute_period(gj, pj, sj, 3600.0)
    outc = compute_period(gc, pc, sc, 3600.0)

    assert abs(float(outc.balance_whole.mbr)) < 2e-3
    s_j = float(W.total_water_content(gj, pj, outj.h, outj.se))
    s_c = float(W.total_water_content(gc, pc, outc.h, outc.se))
    assert s_c == pytest.approx(s_j, rel=1e-4)

    psij = np.asarray(outj.matric_potential(gj))
    psic = np.asarray(outc.matric_potential(gc))
    mask = np.asarray(gj.mask)
    err = np.abs(psij - psic)[mask]
    assert err.max() < 0.1, f"max psi error {err.max():.2e} m"
    assert np.median(err) < 1e-2, f"median psi error {np.median(err):.2e} m"


def test_cg_ponding_storm_mbr_gate_closes():
    """ADVICE round-1 item: the CG inner solver applies the surface clamp
    once after convergence instead of per sweep (projected Jacobi), so
    under active ponding the two inner solvers can reach different
    iterates. The accuracy contract is the MBR acceptance gate — drive a
    ponding-heavy storm (60 mm/h on low-conductivity soil => clamped
    surface nodes everywhere) and assert the gate still closes and the
    integral hydrology matches the Jacobi path."""
    import jax.numpy as jnp
    from criteria3d_tpu import Grid, SoilFields, WaterState
    from criteria3d_tpu.solver.step import initialize_balance
    from tests.test_catchment3d import valley_dem

    def storm_build(params):
        dem = valley_dem(10)
        soil = SoilFields.uniform(dem.shape, vg_alpha=1.0, vg_n=1.3,
                                  vg_he=0.02, theta_s=0.40, theta_r=0.06,
                                  k_sat=2e-7)     # low K -> ponding
        grid = Grid.build(dem, 10.0, soil, total_depth=0.5)
        state = WaterState.initialize(grid, params, matric_potential=-0.5)
        state = initialize_balance(grid, params, state)
        rain = 0.060 * float(grid.area) / 3600.0   # 60 mm/h storm
        sink = jnp.zeros_like(state.sink_source)
        sink = sink.at[0].set(jnp.where(grid.mask[0], rain, 0.0))
        return grid, dataclasses.replace(state, sink_source=sink)

    pj = SolverParameters()
    pc = dataclasses.replace(pj, inner_solver="cg")
    gj, sj = storm_build(pj)
    gc, sc = storm_build(pc)

    outj = compute_period(gj, pj, sj, 3600.0)
    outc = compute_period(gc, pc, sc, 3600.0)

    # ponding actually happened (surface water above the pond height)
    surf = np.asarray(outc.h[0] - gc.z[0])[np.asarray(gc.mask[0])]
    assert (surf > 0.001).mean() > 0.5, "storm should pond most cells"

    # the MBR gate closed for the CG path
    assert abs(float(outc.balance_whole.mbr)) < 2e-3

    # integral hydrology matches the Jacobi path
    s_j = float(W.total_water_content(gj, pj, outj.h, outj.se))
    s_c = float(W.total_water_content(gc, pc, outc.h, outc.se))
    assert s_c == pytest.approx(s_j, rel=5e-3)
