"""Scaling-efficiency harness: grid-points/s at 1..N devices.

BASELINE.md's scaling metric (>=80% efficiency at 1 chip / 1 host / >=2
hosts). On real multi-chip hardware this measures ICI-scaled domain
decomposition; on a single host it can still be exercised against the
virtual CPU mesh (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_
device_count=8) to validate the sharding path, though CPU timings are not
the production numbers.

Usage: python scripts/scaling_bench.py [n_rows] [n_cols]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_case(nr, nc):
    from criteria3d_tpu import Grid, SoilFields, SolverParameters, WaterState
    from criteria3d_tpu.solver.step import initialize_balance

    rows, cols = np.mgrid[0:nr, 0:nc]
    dem = 100.0 + (nr - 1 - rows) * 0.5 + np.abs(cols - nc // 2) * 0.8
    soil = SoilFields.uniform(dem.shape, vg_alpha=1.2, vg_n=1.5, vg_he=0.02,
                              theta_s=0.41, theta_r=0.04, k_sat=5e-6)
    grid = Grid.build(dem, 10.0, soil, total_depth=0.6)
    params = SolverParameters()
    state = WaterState.initialize(grid, params, matric_potential=-1.5)
    state = initialize_balance(grid, params, state)
    rain = 0.015 * float(grid.area) / 3600.0
    sink = jnp.zeros_like(state.sink_source)
    sink = sink.at[0].set(jnp.where(grid.mask[0], rain, 0.0))
    state = dataclasses.replace(state, sink_source=sink)
    return grid, params, state


def time_steps(grid, params, state, n_steps=4):
    from criteria3d_tpu import compute_step
    # warm-up/compile
    s, dt = compute_step(grid, params, state, 3600.0)
    jax.block_until_ready(s.h)
    _ = float(s.balance_current.mbr)
    t0 = time.time()
    s = state
    for _ in range(n_steps):
        s, dt = compute_step(grid, params, s, 3600.0)
    _ = float(s.balance_current.mbr)
    return (time.time() - t0) / n_steps


def main():
    from criteria3d_tpu.parallel.sharding import make_mesh, shard_pytree

    nr = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    nc = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    grid, params, state = build_case(nr, nc)
    n_nodes = grid.n_nodes

    results = {}
    t1 = time_steps(grid, params, state)
    results[1] = dict(step_s=t1, nodes_per_s=n_nodes / t1)

    n_dev = len(jax.devices())
    if n_dev > 1:
        from criteria3d_tpu.core.state import SolverParameters as SP

        mesh = make_mesh(n_dev)
        grid_s = shard_pytree(grid, mesh)
        state_s = shard_pytree(state, mesh)
        tn = time_steps(grid_s, params, state_s)
        results[n_dev] = dict(
            step_s=tn, nodes_per_s=n_nodes / tn,
            efficiency=(t1 / tn) / n_dev)
        # the production configuration (fast_f32 + sharded Pallas sweep
        # loop); on a virtual CPU mesh the kernel runs interpreted, so
        # this leg is a correctness/scaling-shape check, not a wall-clock
        # target (enable with SCALING_PALLAS=1 off-TPU)
        if jax.devices()[0].platform == "tpu" or \
                os.environ.get("SCALING_PALLAS") == "1":
            pp = SP.fast_f32(use_pallas=True, mesh=mesh)
            tp = time_steps(grid_s, pp, state_s)
            results[f"{n_dev}_pallas"] = dict(
                step_s=tp, nodes_per_s=n_nodes / tp)

    print(json.dumps({
        "metric": "scaling_node_steps_per_s",
        "grid": [grid.n_layers, nr, nc],
        "n_nodes": n_nodes,
        "devices": {str(k): v for k, v in results.items()},
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
