"""Benchmark: coupled surface-subsurface water flow on the Ravone catchment.

Runs one simulated hour of storm rainfall on the paper case-study DEM
(DATA/DEM/DEM_Ravone.flt, 4 m cells, ~422k surface cells x 11 soil layers
~= 4.4M nodes when fully masked-in) and prints ONE JSON line.

Metric: wall-clock seconds per simulated hour (the reference's own headline
quantity, BASELINE.md "wall-clock per simulated day" / 24). vs_baseline is the
speedup vs the round-1 recorded value of this same benchmark (first round: 1.0).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

RAVONE = "/root/reference/DATA/DEM/DEM_Ravone.flt"
BASELINE_WALL_S = 276.9  # round-1 recorded wall-clock [s] per simulated hour


def build_ravone(total_depth=0.8):
    from criteria3d_tpu import Grid, SoilFields, SolverParameters, WaterState
    from criteria3d_tpu.io.esri import read_flt
    from criteria3d_tpu.solver.step import initialize_balance

    dem, hdr = read_flt(RAVONE)
    # clay-loam-ish soil of the Ravone landslide study
    soil = SoilFields.uniform(dem.shape, vg_alpha=1.0, vg_n=1.35, vg_he=0.02,
                              theta_s=0.44, theta_r=0.06, k_sat=2e-6)
    grid = Grid.build(dem, hdr.cellsize, soil, total_depth=total_depth,
                      min_thickness=0.04, max_thickness=0.25,
                      max_thickness_depth=0.6)
    params = SolverParameters()
    state = WaterState.initialize(grid, params, matric_potential=-2.0)
    state = initialize_balance(grid, params, state)

    # 20 mm/h storm on the whole catchment
    rain = 0.020 * float(grid.area) / 3600.0
    sink = jnp.zeros_like(state.sink_source)
    sink = sink.at[0].set(jnp.where(grid.mask[0], rain, 0.0))
    state = dataclasses.replace(state, sink_source=sink)
    return grid, params, state


def main():
    from criteria3d_tpu import compute_period, compute_step

    grid, params, state = build_ravone()
    n_nodes = grid.n_nodes

    # warm-up: compile both programs and run one real step
    t0 = time.time()
    wstate, dt = compute_step(grid, params, state, 3600.0)
    jax.block_until_ready(wstate.h)
    compile_s = time.time() - t0

    # measured run: one simulated hour from the initial state
    t0 = time.time()
    out = compute_period(grid, params, state, 3600.0)
    jax.block_until_ready(out.h)
    wall_s = time.time() - t0

    mbr = float(out.balance_whole.mbr)
    result = {
        "metric": "ravone_wallclock_s_per_sim_hour",
        "value": round(wall_s, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_WALL_S / wall_s, 3),
        "n_nodes": n_nodes,
        "compile_s": round(compile_s, 1),
        "whole_period_mbr": mbr,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
