"""Solver-state / linear-system debug dumps.

Analogue of the reference's MCR logging (logFunctions.h:17-60, gated by
MCR_ENABLED): `logNodeGridStruct` dumps the whole nodeGrid and
`createCurrStepLog` dumps each approximation's (A, b, x) to MATLAB .mat
files for hand-operated differential debugging (SURVEY §4).

Here the carrier is ``.npz`` (loadable from numpy/Matlab/Octave alike):

* :func:`dump_solver_state` — the full water state + static grid fields;
* :func:`dump_linear_system` — the assembled 11-point stencil system of the
  CURRENT state (the per-approximation analogue: call it between
  compute_step calls, or at any Picard iterate you reconstruct).
"""

from __future__ import annotations

import numpy as np

from criteria3d_tpu.core.grid import Grid
from criteria3d_tpu.core.state import SolverParameters, WaterState

__all__ = ["dump_solver_state", "dump_linear_system", "load_dump"]


def dump_solver_state(path: str, grid: Grid, params: SolverParameters,
                      state: WaterState) -> str:
    """Write the nodeGrid-equivalent arrays (logNodeGridStruct analogue)."""
    if not path.endswith(".npz"):
        path += ".npz"
    np.savez_compressed(
        path,
        mask=np.asarray(grid.mask), z=np.asarray(grid.z),
        volume=np.asarray(grid.volume), btype=np.asarray(grid.btype),
        bslope=np.asarray(grid.bslope), bsize=np.asarray(grid.bsize),
        roughness=np.asarray(grid.roughness),
        pond_max=np.asarray(grid.pond_max),
        vg_alpha=np.asarray(grid.soil.vg_alpha),
        vg_n=np.asarray(grid.soil.vg_n),
        theta_s=np.asarray(grid.soil.theta_s),
        theta_r=np.asarray(grid.soil.theta_r),
        k_sat=np.asarray(grid.soil.k_sat),
        h=np.asarray(state.h), h_old=np.asarray(state.h_old),
        se=np.asarray(state.se), k=np.asarray(state.k),
        sink_source=np.asarray(state.sink_source),
        pond=np.asarray(state.pond),
        dt_curr=float(state.dt_curr), courant=float(state.courant),
        balance_storage=float(state.balance_current.storage),
        balance_mbr=float(state.balance_current.mbr))
    return path


def dump_linear_system(path: str, grid: Grid, params: SolverParameters,
                       state: WaterState, dt: float,
                       approx: int = 0) -> str:
    """Assemble and write the current linearised system
    (createCurrStepLog analogue: the preconditioned 11-point stencil —
    b, c_up/c_down/c_lat, diagonal — plus capacity, conductivity and the
    boundary flows of this iterate)."""
    import jax.numpy as jnp

    from criteria3d_tpu.solver import water as W

    if not path.endswith(".npz"):
        path += ".npz"

    h = state.h
    h_old = state.h_old
    se = W.compute_se(grid, params, h)
    capacity, k = W.compute_capacity(grid, params, h, h_old, se)
    flow, rate = W.update_boundary_water(
        grid, params, h, h_old, k, state.sink_source, state.pond,
        jnp.asarray(dt, params.dtype))
    system = W.assemble_system(grid, params, h, h_old, k, flow, capacity,
                               state.pond, jnp.asarray(approx, jnp.int32),
                               jnp.asarray(dt, params.dtype))
    np.savez_compressed(
        path,
        b=np.asarray(system.b), diag=np.asarray(system.diag),
        c_up=np.asarray(system.c_up), c_down=np.asarray(system.c_down),
        c_lat=np.asarray(system.c_lat),
        courant=float(system.courant),
        capacity=np.asarray(capacity), k=np.asarray(k),
        water_flow=np.asarray(flow), boundary_rate=np.asarray(rate),
        x0=np.asarray(h), dt=float(dt), approx=int(approx))
    return path


def load_dump(path: str) -> dict:
    """Load a dump back as {name: array} (the .mat-reader counterpart)."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
