"""Time breakdown of the Ravone bench hour: assembly vs sweeps vs balance.

CAVEAT: single-block timings through the remote-TPU tunnel are flaky
(identical programs have produced 0.0-6x spreads between invocations;
back-to-back runs of this script have returned opposite breakdowns, with
whole blocks reading 0.0 on a contended chip); treat bench.py as the
authoritative wall-clock and these shares as indicative only, preferably
from the minimum over several runs on a quiet chip.

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

from criteria3d_tpu.utils.jaxcache import machine_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  machine_cache_dir(os.path.join(REPO, ".jax_cache")))

import jax.numpy as jnp
import numpy as np


def timed_loop(make_loop, x0, n=50):
    """Per-iteration device time of a chained on-device fori_loop.

    On the remote-TPU platform each dispatch costs a tunnel round-trip
    (~ms), so timing single ops measures RTT, not kernel time. Instead the
    op is chained n times inside ONE jitted lax.fori_loop program; the
    difference between the n-iteration and 1-iteration programs isolates
    the device time.
    """
    run_n = make_loop(n)
    run_1 = make_loop(1)

    def wall(fn):
        out = fn(x0)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = fn(x0)
            jax.block_until_ready(out)
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = np.asarray(leaf).ravel()[0]   # device->host fence
            best = min(best, time.time() - t0)
        return best

    t_n = wall(run_n)
    t_1 = wall(run_1)
    return max(t_n - t_1, 1e-9) / (n - 1)


def main():
    import dataclasses

    import bench
    from criteria3d_tpu import SolverParameters, WaterState
    from criteria3d_tpu.solver import water as W
    from criteria3d_tpu.solver.step import initialize_balance

    coarsen = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    grid = bench.build_grid(coarsen)
    params = SolverParameters.fast_f32()

    # one jitted setup program — per-op eager dispatch over the remote-TPU
    # tunnel costs ~1 s/op and would dominate the script otherwise
    from functools import partial

    @partial(jax.jit, static_argnames=("p",))
    def init_state(g, p):
        state = WaterState.initialize(g, p, matric_potential=-2.0)
        state = initialize_balance(g, p, state)
        rain = 0.020 * g.area / 3600.0
        sink = jnp.zeros_like(state.sink_source)
        sink = sink.at[0].set(jnp.where(g.mask[0], rain, 0.0))
        return dataclasses.replace(state, sink_source=sink)

    state = init_state(grid, params)
    jax.block_until_ready(state.h)
    dt = jnp.asarray(300.0, params.dtype)

    pond = state.pond
    from jax import lax

    sd = params.sweep_dtype or params.dtype
    psi0 = jnp.where(grid.mask,
                     state.h - grid.z, 0.0).astype(sd)
    se0 = W.compute_se_psi(grid, params, psi0)

    def assembly_of(psi):
        se = W.compute_se_psi(grid, params, psi)
        return W.assemble_fast(grid, params, psi, psi0, se,
                               state.sink_source, pond,
                               jnp.asarray(0, jnp.int32), dt)

    system, _, _, _ = jax.jit(assembly_of)(psi0)
    jax.block_until_ready(system.b)
    sweep_sys = system

    def balance_of(psi):
        se = W.compute_se_psi(grid, params, psi)
        return W.current_mass_balance_psi(grid, params, psi, se,
                                          jnp.zeros_like(psi),
                                          state.balance_prev.storage, dt)

    # each loop body must depend on the previous iterate, or XLA hoists the
    # whole computation out of the fori_loop
    def assembly_loop(n):
        @jax.jit
        def run(psi):
            def body(i, psi):
                sys, _, _, _ = assembly_of(psi)
                return psi + 1e-12 * sys.b
            return lax.fori_loop(0, n, body, psi)
        return run

    def sweep_loop(n):
        @jax.jit
        def run(x):
            def body(i, x):
                return W.jacobi_sweep_psi(sweep_sys, x, grid,
                                          grid.n_nodes)[0]
            return lax.fori_loop(0, n, body, x)
        return run

    def balance_loop(n):
        @jax.jit
        def run(psi):
            def body(i, psi):
                storage, sink, mbe, mbr = balance_of(psi)
                return psi + 1e-12 * mbr.astype(psi.dtype)
            return lax.fori_loop(0, n, body, psi)
        return run

    # one CG iteration (production inner solver): preconditioned matvec +
    # two M-weighted f64 dot products + the psi-weighted norm pass +
    # axpy updates — mirrors the _cg_solve body (solver/step.py)
    diag = sweep_sys.diag.astype(psi0.dtype)
    z_field = grid.z.astype(psi0.dtype)

    def cg_iter_loop(n):
        @jax.jit
        def run(p):
            def body(i, carry):
                p, rho = carry
                w = p - W.stencil_apply(sweep_sys, p)
                w = jnp.where(grid.mask, w, 0.0)
                pAp = jnp.sum(jnp.where(grid.mask, diag * p * w, 0.0),
                              dtype=jnp.float64).astype(p.dtype)
                alpha = rho / jnp.where(pAp != 0.0, pAp, 1.0)
                z = jnp.where(grid.mask, p - alpha * w, 0.0)
                rho_new = jnp.sum(jnp.where(grid.mask, diag * z * z, 0.0),
                                  dtype=jnp.float64).astype(p.dtype)
                apsi = jnp.abs(z)
                wgt = jnp.where(apsi > 1.0, 1.0 / apsi, 1.0)
                norm = jnp.sum(jnp.where(grid.mask, jnp.abs(z) * wgt, 0.0)) \
                    / grid.n_nodes
                p_new = z + (rho_new / jnp.where(rho != 0.0, rho, 1.0)) * p
                return (p_new + 1e-12 * norm, rho_new)
            p_out, _ = lax.fori_loop(0, n, body,
                                     (p, jnp.ones((), p.dtype)))
            return p_out
        return run

    t_assembly = timed_loop(assembly_loop, psi0, n=30)
    t_sweep = timed_loop(sweep_loop, psi0, n=100)
    t_balance = timed_loop(balance_loop, psi0, n=30)
    t_cg_iter = timed_loop(cg_iter_loop, psi0, n=100)

    # Pallas bundled-sweep kernel (K sweeps per HBM pass) for the
    # XLA-vs-Pallas default decision
    t_pallas_bundle = None
    if jax.devices()[0].platform == "tpu":
        try:
            from criteria3d_tpu.solver.pallas_jacobi import (
                SWEEPS_PER_BUNDLE, jacobi_bundle)
            mask_f = grid.mask.astype(jnp.float32)

            def pallas_loop(n):
                @jax.jit
                def run(x):
                    def body(i, x):
                        x_new, _ = jacobi_bundle(
                            sweep_sys.b, sweep_sys.c_up, sweep_sys.c_down,
                            sweep_sys.c_lat, mask_f, x)
                        return x_new
                    return lax.fori_loop(0, n, body, x)
                return run

            t_pallas_bundle = timed_loop(pallas_loop, psi0, n=20)
        except Exception as e:  # pragma: no cover - informational
            print(f"pallas timing failed: {e}", file=sys.stderr)

    # HBM traffic of one f32 psi-form sweep: read b + 10 c arrays + x,
    # write x' (+ norm) -> 13 arrays x 4 B x box cells
    box = int(np.prod(grid.shape))
    bytes_per_sweep = 13 * 4 * box
    bw = bytes_per_sweep / t_sweep / 1e9

    # counters from the recorded bench (BENCH_r*.json style): the CG
    # production run does 393 iterations / 136 assemblies / 67 balance
    # evaluations per simulated hour (BASELINE.md); the Jacobi-sweep
    # alternative 831 sweeps / 173 / 84
    assemblies, balances, cg_iters = 136, 67, 393
    total = (t_assembly * assemblies + t_cg_iter * cg_iters
             + t_balance * balances)
    result = {
        "coarsen": coarsen,
        "n_nodes": grid.n_nodes,
        "box_cells": box,
        "t_assembly_s": round(t_assembly, 4),
        "t_sweep_s": round(t_sweep, 5),
        "t_cg_iter_s": round(t_cg_iter, 5),
        "t_balance_s": round(t_balance, 4),
        "sweep_hbm_gb_per_s": round(bw, 1),
        "est_hour_s": round(total, 1),
        "share_assembly": round(t_assembly * assemblies / total, 3),
        "share_cg_iters": round(t_cg_iter * cg_iters / total, 3),
        "share_balance": round(t_balance * balances / total, 3),
        "platform": jax.devices()[0].platform,
    }
    if t_pallas_bundle is not None:
        result["t_pallas_bundle_s"] = round(t_pallas_bundle, 5)
        result["pallas_sweep_equiv_s"] = round(
            t_pallas_bundle / SWEEPS_PER_BUNDLE, 6)
        result["pallas_vs_xla_sweep"] = round(
            t_sweep * SWEEPS_PER_BUNDLE / t_pallas_bundle, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
