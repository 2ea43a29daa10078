"""Per-link flow bookkeeping tests (reference: water.cpp:269-277,
soilFluxes3D.cpp:1126-1216)."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from criteria3d_tpu import Grid, SoilFields, SolverParameters, WaterState
from criteria3d_tpu.solver import link_flows as LF
from criteria3d_tpu.solver.shifts import LATERAL_OFFSETS, shift2d
from criteria3d_tpu.solver.step import compute_period, initialize_balance


def make_case(track=True, n=8):
    rows, cols = np.mgrid[0:n, 0:n]
    dem = 100.0 + (n - 1 - rows) * 0.4 + np.abs(cols - n // 2) * 0.6
    soil = SoilFields.uniform(dem.shape, vg_alpha=1.2, vg_n=1.5, vg_he=0.02,
                              theta_s=0.41, theta_r=0.04, k_sat=1e-5)
    grid = Grid.build(dem, 10.0, soil, total_depth=0.5)
    params = SolverParameters(track_link_flow=track)
    state = WaterState.initialize(grid, params, matric_potential=-2.0)
    state = initialize_balance(grid, params, state)
    rain = 0.005 * float(grid.area) / 3600.0
    sink = jnp.zeros_like(state.sink_source)
    sink = sink.at[0].set(jnp.where(grid.mask[0], rain, 0.0))
    state = dataclasses.replace(state, sink_source=sink)
    return grid, params, state


@pytest.fixture(scope="module")
def run():
    grid, params, state = make_case(track=True)
    out = compute_period(grid, params, state, 3600.0)
    return grid, params, out


def test_disabled_by_default():
    grid, params, state = make_case(track=False)
    assert state.link_flow_sum.shape == (0,)
    with pytest.raises(ValueError):
        LF.sum_lateral_flow(state)


def test_link_flows_populated(run):
    grid, params, out = run
    flows = np.asarray(out.link_flow_sum)
    assert flows.shape == (10,) + grid.shape
    # rain infiltrates: the surface's DOWN link must carry negative
    # (outgoing) flow somewhere, and layer-1 UP links the mirror inflow
    assert flows[1, 0][np.asarray(grid.mask[0])].min() < 0.0


def test_vertical_antisymmetry(run):
    """flow through the link seen from above == -(seen from below)."""
    grid, params, out = run
    flows = np.asarray(out.link_flow_sum)
    mask = np.asarray(grid.mask)
    L = grid.shape[0]
    for layer in range(L - 1):
        dn = flows[1, layer]          # down-link of layer l
        up = flows[0, layer + 1]      # up-link of layer l+1
        m = mask[layer] & mask[layer + 1]
        np.testing.assert_allclose(dn[m], -up[m], rtol=1e-9, atol=1e-15)


def test_lateral_antisymmetry(run):
    """lateral link i->j equals -(j->i) in the opposite direction slot."""
    grid, params, out = run
    flows = np.asarray(out.link_flow_sum)
    mask = np.asarray(grid.mask)
    offsets = list(LATERAL_OFFSETS)
    for idx, (di, dj) in enumerate(offsets):
        opp = offsets.index((-di, -dj))
        mine = flows[2 + idx]
        # neighbour's slot opp shifted into my frame
        theirs = np.asarray(shift2d(jnp.asarray(flows[2 + opp]), di, dj))
        nbr_mask = np.asarray(
            shift2d(jnp.asarray(mask.astype(np.float64)), di, dj)) > 0.5
        m = mask & nbr_mask
        np.testing.assert_allclose(mine[m], -theirs[m], rtol=1e-9, atol=1e-15)


def test_in_out_decomposition(run):
    grid, params, out = run
    total = np.asarray(LF.sum_lateral_flow(out))
    fin = np.asarray(LF.sum_lateral_flow_in(out))
    fout = np.asarray(LF.sum_lateral_flow_out(out))
    np.testing.assert_allclose(total, fin + fout, rtol=1e-12, atol=1e-18)
    assert (fin >= 0).all() and (fout <= 0).all()
    assert (np.asarray(LF.max_lateral_flow(out)) >= 0).all()


def test_vertical_flux_matches_storage_gain(run):
    """Water crossing the surface/soil interface equals the subsurface
    storage increase minus boundary losses (closure through link flows)."""
    grid, params, out = run
    flows = np.asarray(out.link_flow_sum)
    mask = np.asarray(grid.mask)
    # total downward flux out of the surface layer [m3]
    surf_dn = -flows[1, 0][mask[0]].sum()
    assert surf_dn > 0.0
    # must be comparable to the hour's rain volume (not wildly off)
    rain_vol = 0.005 * float(grid.area) * mask[0].sum()
    assert surf_dn <= rain_vol * 1.05
    assert surf_dn >= rain_vol * 0.1
