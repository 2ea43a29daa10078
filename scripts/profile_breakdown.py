"""Time breakdown of the Ravone bench hour: assembly vs sweeps vs balance.

VERDICT round-1 item 3 asked where the wall-clock goes. This script times
the three building blocks of the solver in isolation on the bench grid and
combines them with the per-hour counters bench.py reports
(approximations_per_hour assemblies, jacobi_sweeps_per_hour sweeps,
step_attempts_per_hour balance evaluations) into estimated shares, plus an
HBM-bandwidth utilisation figure for the sweep kernel.

Usage: python scripts/profile_breakdown.py [coarsen]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    # device->host fence for the remote platform
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf).ravel()[0]
    return (time.time() - t0) / n


def main():
    import dataclasses

    import bench
    from criteria3d_tpu import SolverParameters, WaterState
    from criteria3d_tpu.solver import water as W
    from criteria3d_tpu.solver.step import initialize_balance

    coarsen = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    grid = bench.build_grid(coarsen)
    params = SolverParameters.fast_f32()

    state = WaterState.initialize(grid, params, matric_potential=-2.0)
    state = initialize_balance(grid, params, state)
    rain = 0.020 * float(np.asarray(grid.area)) / 3600.0
    sink = jnp.zeros_like(state.sink_source)
    sink = sink.at[0].set(jnp.where(grid.mask[0], rain, 0.0))
    state = dataclasses.replace(state, sink_source=sink)
    dt = jnp.asarray(300.0, params.dtype)

    h, h_old, pond = state.h, state.h_old, state.pond

    @jax.jit
    def assembly(h):
        se = W.compute_se(grid, params, h)
        capacity, k = W.compute_capacity(grid, params, h, h_old, se)
        flow, rate = W.update_boundary_water(grid, params, h, h_old, k,
                                             state.sink_source, pond, dt)
        return W.assemble_system(grid, params, h, h_old, k, flow, capacity,
                                 pond, jnp.asarray(0, jnp.int32), dt)

    system = assembly(h)
    jax.block_until_ready(system.b)

    sd = params.sweep_dtype or params.dtype
    sweep_sys = W.LinearSystem(
        b=system.b.astype(sd), c_up=system.c_up.astype(sd),
        c_down=system.c_down.astype(sd), c_lat=system.c_lat.astype(sd),
        diag=system.diag, courant=system.courant)
    psi0 = (h - grid.z).astype(sd)

    @jax.jit
    def one_sweep(x):
        return W.jacobi_sweep_psi(sweep_sys, x, grid, grid.n_nodes)[0]

    @jax.jit
    def balance(h):
        se = W.compute_se(grid, params, h)
        flow, _ = W.update_boundary_water(grid, params, h, h_old,
                                          state.k, state.sink_source, pond,
                                          dt)
        return W.current_mass_balance(grid, params, h, se, flow,
                                      state.balance_prev.storage, dt)

    t_assembly = timed(assembly, h, n=5)
    t_sweep = timed(one_sweep, psi0, n=20)
    t_balance = timed(balance, h, n=5)

    # HBM traffic of one f32 psi-form sweep: read b + 10 c arrays + x,
    # write x' (+ norm) -> 13 arrays x 4 B x box cells
    box = int(np.prod(grid.shape))
    bytes_per_sweep = 13 * 4 * box
    bw = bytes_per_sweep / t_sweep / 1e9

    # counters from the recorded bench (BENCH_r*.json style); fall back to
    # the round-2 full-res measurement
    sweeps, assemblies, balances = 720, 160, 160
    total = (t_assembly * assemblies + t_sweep * sweeps
             + t_balance * balances)
    result = {
        "coarsen": coarsen,
        "n_nodes": grid.n_nodes,
        "box_cells": box,
        "t_assembly_s": round(t_assembly, 4),
        "t_sweep_s": round(t_sweep, 5),
        "t_balance_s": round(t_balance, 4),
        "sweep_hbm_gb_per_s": round(bw, 1),
        "est_hour_s": round(total, 1),
        "share_assembly": round(t_assembly * assemblies / total, 3),
        "share_sweeps": round(t_sweep * sweeps / total, 3),
        "share_balance": round(t_balance * balances / total, 3),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
