"""Multi-device equivalence: the sharded step must match single-device results.

Mirrors the reference's CPU-vs-GPU dual implementation pattern (SURVEY.md §4):
here the oracle is the unsharded run, and the subject is the same jitted
program with (row, col)-sharded inputs on the virtual 8-device CPU mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from criteria3d_tpu import (Grid, SoilFields, SolverParameters, WaterState,
                            compute_period, compute_step)
from criteria3d_tpu.parallel.sharding import make_mesh, shard_pytree
from criteria3d_tpu.solver.step import initialize_balance
from tests.test_catchment3d import valley_dem


def build_case(n=16):
    dem = valley_dem(n)
    soil = SoilFields.uniform(dem.shape, vg_alpha=1.2, vg_n=1.5, vg_he=0.02,
                              theta_s=0.41, theta_r=0.04, k_sat=5e-6)
    grid = Grid.build(dem, 10.0, soil, total_depth=0.6)
    params = SolverParameters()
    state = WaterState.initialize(grid, params, matric_potential=-1.0)
    state = initialize_balance(grid, params, state)
    rain = 0.020 * float(grid.area) / 3600.0
    sink = jnp.zeros_like(state.sink_source)
    sink = sink.at[0].set(jnp.where(grid.mask[0], rain, 0.0))
    state = dataclasses.replace(state, sink_source=sink)
    return grid, params, state


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    grid, params, state = build_case(16)

    ref_state, ref_dt = compute_step(grid, params, state, 3600.0)

    mesh = make_mesh(8)
    grid_s = shard_pytree(grid, mesh)
    state_s = shard_pytree(state, mesh)
    out_state, out_dt = compute_step(grid_s, params, state_s, 3600.0)

    np.testing.assert_allclose(np.asarray(out_state.h), np.asarray(ref_state.h),
                               rtol=0, atol=1e-9)
    assert float(out_dt) == pytest.approx(float(ref_dt))
    # balance scalars agree (cross-chip psum vs local sum)
    assert float(out_state.balance_current.mbr) == pytest.approx(
        float(ref_state.balance_current.mbr), abs=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_period_mass_closure():
    grid, params, state = build_case(16)
    mesh = make_mesh(8)
    grid_s = shard_pytree(grid, mesh)
    state_s = shard_pytree(state, mesh)

    out = compute_period(grid_s, params, state_s, 1800.0)
    assert abs(float(out.balance_whole.mbr)) < 5e-3


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fast_f32_matches_single_device():
    """The production fast path (f64 state + f32 psi-form sweeps) must give
    identical trajectories sharded vs unsharded (VERDICT r1: no sharded
    fast-f32 evidence)."""
    dem = valley_dem(16)
    soil = SoilFields.uniform(dem.shape, vg_alpha=1.2, vg_n=1.5, vg_he=0.02,
                              theta_s=0.41, theta_r=0.04, k_sat=5e-6)
    grid = Grid.build(dem, 10.0, soil, total_depth=0.6)
    params = SolverParameters.fast_f32()
    state = WaterState.initialize(grid, params, matric_potential=-1.0)
    state = initialize_balance(grid, params, state)
    rain = 0.020 * float(grid.area) / 3600.0
    sink = jnp.zeros_like(state.sink_source)
    sink = sink.at[0].set(jnp.where(grid.mask[0], rain, 0.0))
    state = dataclasses.replace(state, sink_source=sink)

    ref_state, ref_dt = compute_step(grid, params, state, 3600.0)

    mesh = make_mesh(8)
    out_state, out_dt = compute_step(shard_pytree(grid, mesh), params,
                                     shard_pytree(state, mesh), 3600.0)
    # f32 sweeps: cross-chip reduction order may differ at the f32 level
    np.testing.assert_allclose(np.asarray(out_state.h),
                               np.asarray(ref_state.h), rtol=0, atol=1e-5)
    assert float(out_dt) == pytest.approx(float(ref_dt))

    # line-preconditioned CG: the vertical Thomas solve runs along the
    # UNSHARDED layer axis (collective-free per chip under GSPMD) and must
    # also match its own single-device trajectory
    params_l = SolverParameters.fast_f32(cg_precond="line")
    ref_l, ref_dt_l = compute_step(grid, params_l, state, 3600.0)
    out_l, out_dt_l = compute_step(shard_pytree(grid, mesh), params_l,
                                   shard_pytree(state, mesh), 3600.0)
    np.testing.assert_allclose(np.asarray(out_l.h), np.asarray(ref_l.h),
                               rtol=0, atol=1e-5)
    assert float(out_dt_l) == pytest.approx(float(ref_dt_l))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_padded_uneven_domain():
    """A domain whose (R, C) don't divide the mesh: pad_to_multiple makes it
    shardable and the padded sharded run matches the unpadded single-device
    run on the original cells (VERDICT r1: no uneven/padded-shard test)."""
    from criteria3d_tpu.parallel.sharding import pad_to_multiple

    n = 13      # not divisible by the (2, 4) mesh
    dem = valley_dem(n)
    mesh = make_mesh(8)
    mr, mc = mesh.shape["row"], mesh.shape["col"]

    def run(dem_arr, sharded):
        soil = SoilFields.uniform(dem_arr.shape, vg_alpha=1.2, vg_n=1.5,
                                  vg_he=0.02, theta_s=0.41, theta_r=0.04,
                                  k_sat=5e-6)
        grid = Grid.build(dem_arr, 10.0, soil, total_depth=0.6)
        params = SolverParameters()
        state = WaterState.initialize(grid, params, matric_potential=-1.0)
        state = initialize_balance(grid, params, state)
        rain = 0.020 * float(grid.area) / 3600.0
        sink = jnp.zeros_like(state.sink_source)
        sink = sink.at[0].set(jnp.where(grid.mask[0], rain, 0.0))
        state = dataclasses.replace(state, sink_source=sink)
        if sharded:
            grid = shard_pytree(grid, mesh)
            state = shard_pytree(state, mesh)
        out, dt = compute_step(grid, params, state, 3600.0)
        return np.asarray(out.h), float(dt)

    h_ref, dt_ref = run(dem, sharded=False)

    dem_pad = pad_to_multiple(dem, mr, mc)
    assert dem_pad.shape[0] % mr == 0 and dem_pad.shape[1] % mc == 0
    h_pad, dt_pad = run(dem_pad, sharded=True)

    np.testing.assert_allclose(h_pad[:, :n, :n], h_ref, rtol=0, atol=1e-9)
    assert dt_pad == pytest.approx(dt_ref)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_unshardable_domain_fails_loudly():
    """_spec_for must raise (not silently replicate) when a full-size field
    can't be decomposed over the mesh (VERDICT r1 'weak' item)."""
    grid, params, state = build_case(13)   # 13 not divisible by (2, 4)
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="pad"):
        shard_pytree(grid, mesh)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_halo_exchange_unit():
    """halo_exchange must reproduce numpy zero-padded neighbourhoods,
    including the corner cells carried by the two-phase exchange."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from criteria3d_tpu.parallel.sharding import halo_exchange

    mesh = make_mesh(8)
    mr, mc = mesh.shape["row"], mesh.shape["col"]
    R, C = 4 * mr, 4 * mc
    k = 2
    a = np.arange(2 * R * C, dtype=np.float32).reshape(2, R, C) + 1.0

    def local(x):
        return halo_exchange(x, k, mesh, dims=(-2, -1), axes=("row", "col"))

    out = shard_map(local, mesh=mesh,
                    in_specs=P(None, "row", "col"),
                    out_specs=P(None, "row", "col"), check_vma=False)(
        jnp.asarray(a))
    out = np.asarray(out)    # (2, R + mr*2k, C + mc*2k), blocks interleaved

    padded = np.pad(a, ((0, 0), (k, k), (k, k)))
    lr, lc = R // mr, C // mc
    for bi in range(mr):
        for bj in range(mc):
            blk = out[:, bi * (lr + 2 * k):(bi + 1) * (lr + 2 * k),
                      bj * (lc + 2 * k):(bj + 1) * (lc + 2 * k)]
            exp = padded[:, bi * lr:bi * lr + lr + 2 * k,
                         bj * lc:bj * lc + lc + 2 * k]
            np.testing.assert_array_equal(blk, exp)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_pallas_matches_single_device():
    """The SHIPPED production configuration — fast_f32 + Pallas bundled
    sweeps (bench.py's parameter set) — must give the same trajectory on the
    8-device mesh (shard_map + K-cell halo exchange, interpret-mode kernel)
    as on a single device (VERDICT r2 next-round item 1)."""
    dem = valley_dem(32)
    soil = SoilFields.uniform(dem.shape, vg_alpha=1.2, vg_n=1.5, vg_he=0.02,
                              theta_s=0.41, theta_r=0.04, k_sat=5e-6)
    grid = Grid.build(dem, 10.0, soil, total_depth=0.6)
    params = SolverParameters.fast_f32(use_pallas=True)
    state = WaterState.initialize(grid, params, matric_potential=-1.0)
    state = initialize_balance(grid, params, state)
    rain = 0.020 * float(grid.area) / 3600.0
    sink = jnp.zeros_like(state.sink_source)
    sink = sink.at[0].set(jnp.where(grid.mask[0], rain, 0.0))
    state = dataclasses.replace(state, sink_source=sink)

    ref_state, ref_dt = compute_step(grid, params, state, 3600.0)

    mesh = make_mesh(8)
    params_s = SolverParameters.fast_f32(use_pallas=True, mesh=mesh)
    out_state, out_dt = compute_step(shard_pytree(grid, mesh), params_s,
                                     shard_pytree(state, mesh), 3600.0)
    # the halo'd kernel computes identical sweeps; only the norm psum order
    # differs, so trajectories should agree to f32 reduction noise
    np.testing.assert_allclose(np.asarray(out_state.h),
                               np.asarray(ref_state.h), rtol=0, atol=1e-5)
    assert float(out_dt) == pytest.approx(float(ref_dt))
    assert float(out_state.balance_current.mbr) == pytest.approx(
        float(ref_state.balance_current.mbr), abs=1e-8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_coupled_heat_matches_single_device():
    """Round-4: the COUPLED water+heat hour (vapor on, f32 heat fast path)
    shards over the (row, col) mesh and reproduces the single-device
    trajectory — the full production step, not just the water half."""
    from criteria3d_tpu.core.grid import BoundaryType
    from criteria3d_tpu.solver import heat as H
    from criteria3d_tpu.solver.coupled import compute_period_coupled

    dem = valley_dem(16)
    soil = SoilFields.uniform(dem.shape, vg_alpha=1.4, vg_n=1.6, vg_he=0.02,
                              theta_s=0.43, theta_r=0.05, k_sat=1e-5)
    grid = Grid.build(dem, 10.0, soil, total_depth=0.6)
    grid = dataclasses.replace(
        grid,
        btype=grid.btype.at[1].set(jnp.where(
            grid.mask[1], int(BoundaryType.HEAT_SURFACE), grid.btype[1])),
        bsize=grid.bsize.at[1].set(jnp.where(
            grid.mask[1], float(grid.area), grid.bsize[1])))
    params = SolverParameters(heat_vapor=True)
    water = WaterState.initialize(grid, params, matric_potential=-2.0)
    water = initialize_balance(grid, params, water)
    heat = H.initialize_heat(grid, 285.15)
    heat = dataclasses.replace(
        heat, storage_prev=H.heat_storage(grid, params, heat, water),
        storage_whole=H.heat_storage(grid, params, heat, water))
    boundary = H.HeatBoundary.uniform(
        grid.shape[1:], air_temperature=295.15, rel_humidity=55.0,
        wind_speed=2.0, net_irradiance=250.0, mask=grid.mask[1])

    ref_w, ref_h = compute_period_coupled(grid, params, water, heat,
                                          boundary, 3600.0)

    mesh = make_mesh(8)
    grid_s = shard_pytree(grid, mesh)
    water_s = shard_pytree(water, mesh)
    heat_s = shard_pytree(heat, mesh)
    boundary_s = shard_pytree(boundary, mesh)
    out_w, out_h = compute_period_coupled(grid_s, params, water_s, heat_s,
                                          boundary_s, 3600.0)

    # f64: the sharded program is the same computation modulo collective
    # reduction order — trajectories match tightly over the full hour
    np.testing.assert_allclose(np.asarray(out_w.h), np.asarray(ref_w.h),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_h.t), np.asarray(ref_h.t),
                               rtol=0, atol=1e-5)
    assert float(out_h.mbr) == pytest.approx(float(ref_h.mbr), abs=1e-3)

    # f32 fast path: cross-chip reduction reordering at the f32 level
    # compounds through the adaptive water-dt AND heat-substep gates over
    # an hour; the spread is the fast path's own inter-trajectory
    # envelope (measured ~3e-4 m / ~5e-2 K on this case)
    params_f = SolverParameters.fast_f32(heat_vapor=True)
    water_f = WaterState.initialize(grid, params_f, matric_potential=-2.0)
    water_f = initialize_balance(grid, params_f, water_f)
    heat_f = H.initialize_heat(grid, 285.15)
    heat_f = dataclasses.replace(
        heat_f, storage_prev=H.heat_storage(grid, params_f, heat_f, water_f),
        storage_whole=H.heat_storage(grid, params_f, heat_f, water_f))
    ref_wf, ref_hf = compute_period_coupled(grid, params_f, water_f, heat_f,
                                            boundary, 3600.0)
    out_wf, out_hf = compute_period_coupled(
        shard_pytree(grid, mesh), params_f, shard_pytree(water_f, mesh),
        shard_pytree(heat_f, mesh), shard_pytree(boundary, mesh), 3600.0)
    np.testing.assert_allclose(np.asarray(out_wf.h), np.asarray(ref_wf.h),
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_hf.t), np.asarray(ref_hf.t),
                               rtol=0, atol=0.2)
