"""Adaptive time stepping: Picard outer loop, Jacobi inner loop, Δt control.

This is the TPU-native re-expression of the reference's solver control flow
(CPUSolver::waterMainLoop / waterApproximationLoop / solveLinearSystem,
agrolib/soilFluxes3D/cpusolver.cpp:143-468,672-703, and evaluateWaterBalance,
water.cpp:165-227). Everything — the step-retry loop, the <=10 Picard
approximations, the <=150 Jacobi sweeps, the mass-balance accept/halve/grow
Δt machine — runs on device inside nested ``lax.while_loop``s with scalar
carries; there are no host round-trips inside a step.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from criteria3d_tpu.core.grid import Grid
from criteria3d_tpu.core.state import BalanceData, SolverParameters, WaterState
from criteria3d_tpu.solver import water as W

__all__ = ["compute_step", "compute_period",
           "compute_period_stats", "initialize_balance"]

# step outcome codes (balanceResult_t, types.h:174)
RUNNING = 0
ACCEPTED = 1
REFUSED = 2
HALVED = 3
NAN = 4


def initialize_balance(grid: Grid, params: SolverParameters,
                       state: WaterState) -> WaterState:
    """Reset all balance counters to the current storage.

    Reference: initializeWaterBalance (water.cpp:35-65) — called by the app
    at the start of every model run (project3D.cpp:1313 initializeBalance).
    """
    se = W.compute_se(grid, params, state.h)
    storage = W.total_water_content(grid, params, state.h, se)
    zero = jnp.zeros((), params.dtype)
    bal = BalanceData(storage=storage, sink_source=zero, mbe=zero, mbr=zero)
    return WaterState(
        h=state.h, h_old=state.h, best_h=state.h, se=se, k=state.k,
        sink_source=state.sink_source, pond=state.pond,
        boundary_flow_sum=jnp.zeros_like(state.boundary_flow_sum),
        link_flow_sum=jnp.zeros_like(state.link_flow_sum),
        dt_curr=state.dt_curr, courant=state.courant,
        balance_prev=bal, balance_current=bal,
        balance_period=bal, balance_whole=bal,
    )


# ----------------------------------------------------------------------
# inner: Jacobi iterations
# ----------------------------------------------------------------------

def _jacobi_solve(system: W.LinearSystem, x0: jax.Array, grid: Grid,
                  params: SolverParameters, approx: jax.Array):
    """Iterate Jacobi sweeps until convergence/divergence/iteration cap.

    Returns (x, diverged). Reference: solveLinearSystem
    (cpusolver.cpp:672-703) with the per-approximation iteration budget
    max(25, (approx+1)·maxIter/maxApprox) (solver.h:55-59).

    When ``params.sweep_dtype`` is float32 (psi-carry fast path), ``x0``
    and the system are ALREADY f32 signed psi — elevation entered the RHS
    as static per-link dz during assembly, so neighbour differences inside
    the f32 hot loop keep full precision over a catchment with hundreds of
    metres of relief, and the solve returns psi.
    """
    max_iter = params.max_iterations_for(approx)
    tol = params.residual_tolerance

    fast = (params.sweep_dtype is not None
            and params.sweep_dtype != params.dtype)

    if fast:
        # psi-carry: the system AND x0 are already f32 psi-form (the
        # elevation terms entered the RHS as static per-link dz during
        # assembly); the solve stays in psi space end to end
        sweep_sys = system
        x_init = x0
        tol = max(tol, 1e-7)
    else:
        sweep_sys = system
        x_init = x0

    # Force the assembled stencil to MATERIALIZE before the sweep loop.
    # Without this barrier XLA may fuse the (transcendental-heavy) assembly
    # chain into the while-loop body and recompute it on every sweep —
    # observed as a ~20x whole-program slowdown on TPU. (The Pallas path
    # gets the same effect for free: pallas_call operands cannot be fused
    # into.)
    sweep_sys, x_init = lax.optimization_barrier((sweep_sys, x_init))

    if params.inner_solver == "cg":
        return _cg_solve(sweep_sys, x_init, grid, params,
                         max_iter, tol, psi_form=fast)

    use_pallas = fast and params.use_pallas
    if use_pallas:
        from criteria3d_tpu.solver.pallas_jacobi import jacobi_solve_loop
        mask_f = grid.mask.astype(params.sweep_dtype)
        x, diverged, n_it = jacobi_solve_loop(
            sweep_sys.b, sweep_sys.c_up, sweep_sys.c_down, sweep_sys.c_lat,
            mask_f, x_init, max_iter, tol, grid.n_nodes, mesh=params.mesh)
        return x, diverged, n_it

    def cond(c):
        _, it, _, done, _ = c
        return jnp.logical_and(~done, it < max_iter)

    def body(c):
        x, it, best, done, diverged = c
        if fast:
            x_new, norm = W.jacobi_sweep_psi(sweep_sys, x, grid, grid.n_nodes)
            it_inc = 1
        else:
            x_new, norm = W.jacobi_sweep(sweep_sys, x, grid, grid.n_nodes)
            it_inc = 1
        converged = norm < tol
        div = jnp.logical_and(~converged, norm > best * 10.0)
        best = jnp.minimum(best, norm)
        return (x_new, it + it_inc, best, converged | div, div)

    best0 = jnp.ones((), x_init.dtype)
    x, n_it, _, _, diverged = lax.while_loop(
        cond, body, (x_init, jnp.zeros((), jnp.int32), best0,
                     jnp.zeros((), bool), jnp.zeros((), bool)))
    return x, diverged, n_it


def _cg_solve(system: W.LinearSystem, x_init: jax.Array, grid: Grid,
              params: SolverParameters, max_iter, tol, psi_form: bool):
    """Preconditioned conjugate gradient on the assembled system.

    The analogue of the reference's optional "lineal" external CG/PCG solver
    (cpusolver.cpp:608-669, lineal/linealiaLib.h). Works entirely through the
    stored *Jacobi-scaled* stencil: one Jacobi application ``G(x) = b + Cx``
    gives the scaled residual ``s = G(x) - x = D^-1 (b_phys - A x)``, the
    scaled matvec is ``D^-1 A p = p - C p``, and D-weighted dot products
    recover the true ``r . z`` / ``p . A p`` inner products.

    Preconditioner (params.cg_precond): "line" solves the vertical
    tridiagonal block of the operator exactly per iteration
    (``z = T^-1 s`` via a batched Thomas scan, W.tridiag_vertical_solve) —
    the grid's cm-vertical vs m-lateral anisotropy otherwise dominates the
    condition number; "diag" is plain Jacobi preconditioning (z = s, the
    previous behaviour).

    Convergence uses the same psi-weighted mean |s| norm as the Jacobi
    path (s IS the Jacobi update dx) for EITHER preconditioner, so the
    residual tolerance keeps its meaning. Like the reference's lineal
    path, no per-sweep surface clamp — the clamp is applied once at the
    end.

    Returns (x, diverged); diverged on CG breakdown (pAp <= 0) or a norm
    blow-up past 10x the best seen, mirroring solveLinearSystem's abort.
    """
    dt = x_init.dtype
    mask = grid.mask
    diag = system.diag.astype(dt)
    z_field = grid.z.astype(dt)
    line = params.cg_precond == "line"

    def precond(s):
        if line:
            return jnp.where(mask,
                             W.tridiag_vertical_solve(system.c_up,
                                                      system.c_down, s), 0.0)
        return s

    def weight_norm(z, x):
        apsi = jnp.abs(x) if psi_form else jnp.abs(x - z_field)
        w = jnp.where(apsi > 1.0, 1.0 / apsi, 1.0)
        return jnp.sum(jnp.where(mask, jnp.abs(z) * w, 0.0)) / grid.n_nodes

    def mdot(a, b):
        # <a, b>_D in f64 (the balance gate's precision) regardless of dtype
        return jnp.sum(jnp.where(mask, diag * a * b, 0.0),
                       dtype=jnp.float64).astype(dt)

    s0 = system.b + W.stencil_apply(system, x_init) - x_init
    s0 = jnp.where(mask, s0, 0.0)
    p0 = precond(s0)
    rho0 = mdot(s0, p0)                              # r . M^-1 r
    norm0 = weight_norm(s0, x_init)

    def cond(c):
        _, _, _, _, it, _, done, _ = c
        return jnp.logical_and(~done, it < max_iter)

    def body(c):
        x, s, p, rho, it, best, done, diverged = c
        w = p - W.stencil_apply(system, p)          # D^-1 A p
        w = jnp.where(mask, w, 0.0)
        pAp = mdot(p, w)
        breakdown = pAp <= 0.0
        alpha = jnp.where(breakdown, 0.0, rho / jnp.where(pAp != 0.0, pAp, 1.0))
        x_new = jnp.where(mask, x + alpha * p, 0.0)
        s_new = jnp.where(mask, s - alpha * w, 0.0)
        z_new = precond(s_new)
        rho_new = mdot(s_new, z_new)
        beta = rho_new / jnp.where(rho != 0.0, rho, 1.0)
        p_new = z_new + beta * p
        norm = weight_norm(s_new, x_new)
        converged = norm < tol
        div = breakdown | jnp.logical_and(~converged, norm > best * 10.0)
        best = jnp.minimum(best, norm)
        return (x_new, s_new, p_new, rho_new, it + 1, best,
                converged | div, div)

    init = (x_init, s0, p0, rho0, jnp.zeros((), jnp.int32),
            jnp.maximum(norm0, jnp.asarray(tol, norm0.dtype)),
            norm0 < tol, jnp.zeros((), bool))
    x, _, _, _, n_it, _, _, diverged = lax.while_loop(cond, body, init)

    # surface clamp once on the converged solution (JacobiWaterCPU applies
    # it per sweep, water.cpp:583-585; the lineal path not at all)
    floor0 = jnp.zeros_like(z_field[0]) if psi_form else z_field[0]
    x = x.at[0].set(jnp.maximum(x[0], floor0))
    x = jnp.where(mask, x, 0.0)
    return x, diverged, n_it


def _decimal_floor_dt(dt: jax.Array) -> jax.Array:
    """Floor dt at its first significant decimal digit (checkCourant,
    cpusolver.cpp:262-277): multiply by 10 until >= 1, floor, scale back."""
    def cond(c):
        v, _ = c
        return v < 1.0

    def body(c):
        v, n = c
        return v * 10.0, n + 1

    v, n = lax.while_loop(cond, body, (dt, jnp.zeros((), jnp.int32)))
    return jnp.floor(v) / (10.0 ** n.astype(dt.dtype))


# ----------------------------------------------------------------------
# middle: Picard approximation loop
# ----------------------------------------------------------------------

class _ApproxCarry(NamedTuple):
    approx: jax.Array
    result: jax.Array
    h: jax.Array
    se: jax.Array
    k: jax.Array
    water_flow: jax.Array
    boundary_rate: jax.Array
    best_h: jax.Array
    best_mbr: jax.Array
    dt_curr: jax.Array
    courant: jax.Array
    balance: tuple  # (storage, sink, mbe, mbr)
    n_sweeps: jax.Array   # accumulated Jacobi sweeps (diagnostics)
    # physical (un-preconditioned) conductances of the last assembly, kept
    # only when params.track_link_flow (else zero-size placeholders)
    a_up: jax.Array
    a_lat: jax.Array


def _approximation_loop(grid: Grid, params: SolverParameters,
                        h: jax.Array, h_old: jax.Array, se: jax.Array,
                        sink_source: jax.Array, pond: jax.Array,
                        prev_storage: jax.Array, dt: jax.Array,
                        dt_curr: jax.Array,
                        extra_flux_fn=None,
                        boundary_flux_fn=None) -> _ApproxCarry:
    """One attempt at time step ``dt`` (waterApproximationLoop,
    cpusolver.cpp:392-468).

    ``extra_flux_fn(psi, k) -> (L,R,C) [m3 s-1]`` is the invariantFluxes
    mechanism (water.cpp:329-341, cpusolver.cpp:388): heat-coupling water
    flows re-evaluated at EVERY Picard iteration, entering the RHS but not
    the balance sums. ``boundary_flux_fn(psi, dt) -> (L,R,C) [m3 s-1]`` is
    a per-iteration BOUNDARY flow (the HeatSurface evaporative water sink,
    water.cpp:708-747) that — like any boundary rate — enters the RHS AND
    the balance sums. Both receive SIGNED PSI (h - z; f32 on the fast
    path, f64 otherwise).

    PSI-CARRY: on the fast path the caller passes ``h``/``h_old``/``se``
    as f32 signed-psi / saturation fields and the whole Picard loop runs
    in that representation — no f64 element-wise work per iteration; f64
    total heads are reconstructed once on step acceptance."""
    dtype = params.dtype
    zero = jnp.zeros((), dtype)
    fast = (params.sweep_dtype is not None
            and params.sweep_dtype != params.dtype)
    psi_old32 = h_old if fast else None

    def evaluate(carry: _ApproxCarry) -> _ApproxCarry:
        """evaluateWaterBalance (water.cpp:165-227) + acceptStep/restoreBestStep."""
        approx = carry.approx
        if fast:
            storage, sink, mbe, mbr = W.current_mass_balance_psi(
                grid, params, carry.h, carry.se, carry.water_flow,
                prev_storage, dt)
        else:
            storage, sink, mbe, mbr = W.current_mass_balance(
                grid, params, carry.h, carry.se, carry.water_flow,
                prev_storage, dt)
        err = jnp.abs(mbr)
        is_nan = ~jnp.isfinite(err)
        can_halve = dt > params.delta_t_min

        ok = jnp.logical_and(~is_nan, err < params.mbr_threshold)

        # best-step tracking (before the instability check)
        store_best = (~is_nan) & (~ok) & ((approx == 0) | (err < carry.best_mbr))
        best_h = jnp.where(store_best, carry.h, carry.best_h)
        best_mbr = jnp.where(store_best, err, carry.best_mbr)

        unstable = (~is_nan) & (~ok) & (
            (err > best_mbr * params.instability_factor)
            | (approx == params.max_approximations - 1))

        halved = (is_nan & can_halve) | (unstable & can_halve)
        restore = (is_nan & ~can_halve & (approx > 0)) | (unstable & ~can_halve)
        fatal_nan = is_nan & ~can_halve & (approx == 0)
        accepted = ok | restore

        # A refused balance keeps the Picard loop RUNNING (the reference's
        # for-loop just moves to the next approximation on stepRefused).
        result = jnp.where(accepted, ACCEPTED,
                           jnp.where(halved, HALVED,
                                     jnp.where(fatal_nan, NAN, RUNNING)))

        # Δt update: halve on failure; grow on clean low-error acceptance
        grow = ok & (approx < 3) & (err < params.mbr_threshold * 0.1) \
            & (carry.courant < params.courant_threshold)
        dt_new = jnp.where(
            halved, jnp.maximum(carry.dt_curr * 0.5, params.delta_t_min),
            jnp.where(grow, jnp.minimum(params.delta_t_max, carry.dt_curr * 2.0),
                      carry.dt_curr))

        def do_restore(_):
            # restoreBestStep (water.cpp:253-267)
            h_r = best_h
            if fast:
                se_r = W.compute_se_psi(grid, params, h_r)
                # the fused assembly recomputes flows and k for the
                # restored iterate (the stencil part is discarded;
                # restores are rare)
                _, flow_r, rate_r, k_r = W.assemble_fast(
                    grid, params, h_r, psi_old32, se_r, sink_source, pond,
                    carry.approx, dt, boundary_flux_fn=boundary_flux_fn)
                bal_r = W.current_mass_balance_psi(
                    grid, params, h_r, se_r, flow_r, prev_storage, dt)
            else:
                se_r = W.compute_se(grid, params, h_r)
                _, k_r = W.compute_capacity(grid, params, h_r, h_old, se_r)
                flow_r, rate_r = W.update_boundary_water(
                    grid, params, h_r, h_old, k_r, sink_source, pond, dt)
                if boundary_flux_fn is not None:
                    br_r = boundary_flux_fn(h_r - grid.z, dt)
                    flow_r = flow_r + br_r
                    rate_r = rate_r + br_r
                bal_r = W.current_mass_balance(
                    grid, params, h_r, se_r, flow_r, prev_storage, dt)
            return h_r, se_r, k_r, flow_r, rate_r, bal_r

        def no_restore(_):
            return (carry.h, carry.se, carry.k, carry.water_flow,
                    carry.boundary_rate, (storage, sink, mbe, mbr))

        h2, se2, k2, flow2, rate2, bal2 = lax.cond(
            restore, do_restore, no_restore, None)

        return carry._replace(
            result=result, h=h2, se=se2, k=k2, water_flow=flow2,
            boundary_rate=rate2, best_h=best_h, best_mbr=best_mbr,
            dt_curr=dt_new, balance=bal2)

    def body(carry: _ApproxCarry) -> _ApproxCarry:
        approx = carry.approx
        if fast:
            # single fused f32 psi-form pass (capacity + boundary + stencil)
            system, flow, rate, k = W.assemble_fast(
                grid, params, carry.h, psi_old32, carry.se,
                sink_source, pond, approx, dt, extra_flux_fn=extra_flux_fn,
                boundary_flux_fn=boundary_flux_fn)
        else:
            capacity, k = W.compute_capacity(grid, params, carry.h, h_old,
                                             carry.se)
            flow, rate = W.update_boundary_water(
                grid, params, carry.h, h_old, k, sink_source, pond, dt)
            if boundary_flux_fn is not None or extra_flux_fn is not None:
                psi64 = carry.h - grid.z
            if boundary_flux_fn is not None:
                br = boundary_flux_fn(psi64, dt)
                flow = flow + br
                rate = rate + br
            flow_rhs = flow if extra_flux_fn is None else \
                flow + extra_flux_fn(psi64, k)
            system = W.assemble_system(
                grid, params, carry.h, h_old, k, flow_rhs, capacity, pond,
                approx, dt)

        courant_fail = jnp.logical_and(system.courant >= 1.01,
                                       dt > params.delta_t_min)

        def on_courant_fail(carry):
            # checkCourant (cpusolver.cpp:248-281)
            dt_new = _decimal_floor_dt(carry.dt_curr / system.courant)
            dt_new = jnp.maximum(params.delta_t_min, dt_new)
            return carry._replace(result=jnp.asarray(HALVED),
                                  dt_curr=dt_new, courant=system.courant,
                                  k=k, water_flow=flow, boundary_rate=rate,
                                  approx=approx + 1)

        def on_solve(carry):
            x, diverged, n_it = _jacobi_solve(system, carry.h, grid, params,
                                              approx)
            carry = carry._replace(n_sweeps=carry.n_sweeps + n_it)
            halve_on_diverge = jnp.logical_and(diverged,
                                               dt > params.delta_t_min)

            def diverged_branch(carry):
                dt_new = jnp.maximum(params.delta_t_min, carry.dt_curr / 2.0)
                return carry._replace(result=jnp.asarray(HALVED),
                                      dt_curr=dt_new, courant=system.courant,
                                      k=k, water_flow=flow, boundary_rate=rate,
                                      approx=approx + 1)

            def update_branch(carry):
                h_new = x
                se_new = (W.compute_se_psi(grid, params, h_new) if fast
                          else W.compute_se(grid, params, h_new))
                carry = carry._replace(
                    h=h_new, se=se_new, k=k, water_flow=flow,
                    boundary_rate=rate, courant=system.courant)
                if params.track_link_flow:
                    # recover physical conductances from the preconditioned
                    # stencil (updateLinkFlux analogue, water.cpp:269-277)
                    carry = carry._replace(
                        a_up=system.c_up * system.diag,
                        a_lat=system.c_lat * system.diag[None])
                carry = evaluate(carry)
                return carry._replace(approx=approx + 1)

            return lax.cond(halve_on_diverge, diverged_branch, update_branch, carry)

        return lax.cond(courant_fail, on_courant_fail, on_solve, carry)

    def cond(carry: _ApproxCarry):
        return jnp.logical_and(carry.result == RUNNING,
                               carry.approx < params.max_approximations)

    if params.track_link_flow:
        # the stored conductances take the system's dtype (f32 on the fast
        # psi-form path, f64 otherwise)
        lf_dtype = params.sweep_dtype if fast else dtype
        a_up0 = jnp.zeros(h.shape, lf_dtype)
        a_lat0 = jnp.zeros((8,) + h.shape, lf_dtype)
    else:
        a_up0 = jnp.zeros((0,), dtype)
        a_lat0 = jnp.zeros((0,), dtype)
    init = _ApproxCarry(
        approx=jnp.zeros((), jnp.int32),
        result=jnp.asarray(RUNNING),
        h=h, se=se, k=jnp.zeros_like(h),
        water_flow=jnp.zeros_like(h), boundary_rate=jnp.zeros_like(h),
        best_h=h, best_mbr=jnp.asarray(jnp.inf, dtype),
        dt_curr=dt_curr, courant=zero,
        balance=(zero, zero, zero, zero),
        n_sweeps=jnp.zeros((), jnp.int32),
        a_up=a_up0, a_lat=a_lat0,
    )
    return lax.while_loop(cond, body, init)


# ----------------------------------------------------------------------
# outer: step-retry loop (waterMainLoop) and the public API
# ----------------------------------------------------------------------

class _StepCarry(NamedTuple):
    state: WaterState
    dt_accepted: jax.Array
    done: jax.Array
    nan_flag: jax.Array
    stats: tuple    # (n_attempts, n_approx, n_sweeps) int32 diagnostics
    # boundary rate of the accepted step's LAST assembly — the reference's
    # boundaryData.waterFlowRate as seen by the subsequent heat boundary
    # (computeNodeAtmosphericLatentHeatFlux reads it, heat.cpp:957-966)
    boundary_rate: jax.Array


def _compute_step(grid: Grid, params: SolverParameters, state: WaterState,
                  max_time_step: jax.Array, extra_flux_fn=None,
                  boundary_flux_fn=None):
    dtype = params.dtype
    fast = (params.sweep_dtype is not None
            and params.sweep_dtype != params.dtype)

    def body(c: _StepCarry) -> _StepCarry:
        st = c.state
        dt = jnp.minimum(st.dt_curr, max_time_step)
        h_old = st.h

        if fast:
            # psi-carry: ONE f64 subtraction per attempt, then the whole
            # Picard loop runs in f32 signed psi
            sd = params.sweep_dtype
            psi_seed = jnp.where(grid.mask, st.h - grid.z, 0.0).astype(sd)
            se_seed = W.compute_se_psi(grid, params, psi_seed)
            out = _approximation_loop(
                grid, params, psi_seed, psi_seed, se_seed, st.sink_source,
                st.pond, st.balance_prev.storage, dt, st.dt_curr,
                extra_flux_fn=extra_flux_fn,
                boundary_flux_fn=boundary_flux_fn)
        else:
            se = W.compute_se(grid, params, st.h)
            out = _approximation_loop(
                grid, params, st.h, h_old, se, st.sink_source, st.pond,
                st.balance_prev.storage, dt, st.dt_curr,
                extra_flux_fn=extra_flux_fn,
                boundary_flux_fn=boundary_flux_fn)

        accepted = out.result == ACCEPTED
        # NAN is fatal; a RUNNING leak is impossible by construction (the last
        # approximation always yields a terminal result) but treated as fatal
        # rather than risking a non-terminating retry loop.
        fatal = (out.result == NAN) | (out.result == RUNNING)
        storage, sink, mbe, mbr = out.balance

        # acceptStep (water.cpp:230-251): balances + cumulative boundary flow
        new_prev = BalanceData(storage=storage, sink_source=sink,
                               mbe=st.balance_prev.mbe, mbr=st.balance_prev.mbr)
        new_period = BalanceData(
            storage=st.balance_period.storage,
            sink_source=st.balance_period.sink_source + sink,
            mbe=st.balance_period.mbe, mbr=st.balance_period.mbr)
        new_bflow = st.boundary_flow_sum + out.boundary_rate * dt

        if params.track_link_flow:
            # per-link integrated flows [m3], positive = inflow to the node
            # (linkData waterFlowSum; water.cpp:269-277 — see DEVIATIONS.md:
            # we use physical conductances, not post-preconditioning values)
            h_n = out.h
            a_down = jnp.roll(out.a_up, -1, axis=0).at[-1].set(0.0)
            if fast:
                # psi-space head differences need the static per-link dz
                sd32 = params.sweep_dtype
                vd32 = grid.vert_dist.astype(sd32)
                dzl32 = grid.dz_lat.astype(sd32)
                f_up = out.a_up * (jnp.roll(h_n, 1, axis=0) - h_n
                                   + vd32) * dt
                f_down = a_down * (jnp.roll(h_n, -1, axis=0) - h_n
                                   - jnp.roll(vd32, -1, axis=0)) * dt
                f_lat = [out.a_lat[i] * (W.shift2d(h_n, di, dj) - h_n
                                         + dzl32[i]) * dt
                         for i, (di, dj) in enumerate(W.LATERAL_OFFSETS)]
            else:
                f_up = out.a_up * (jnp.roll(h_n, 1, axis=0) - h_n) * dt
                f_down = a_down * (jnp.roll(h_n, -1, axis=0) - h_n) * dt
                f_lat = [out.a_lat[i] * (W.shift2d(h_n, di, dj) - h_n) * dt
                         for i, (di, dj) in enumerate(W.LATERAL_OFFSETS)]
            flows = jnp.stack([f_up, f_down] + f_lat)
            new_link = jnp.where(accepted, st.link_flow_sum + flows,
                                 st.link_flow_sum)
        else:
            new_link = st.link_flow_sum

        if fast:
            # reconstruct the f64 state once per accepted step
            h_acc = jnp.where(grid.mask,
                              grid.z + out.h.astype(dtype), 0.0)
            se_acc = out.se.astype(dtype)
            k_acc = out.k.astype(dtype)
            best_acc = jnp.where(grid.mask,
                                 grid.z + out.best_h.astype(dtype), 0.0)
        else:
            h_acc, se_acc, k_acc = out.h, out.se, out.k
            best_acc = out.best_h

        new_state = WaterState(
            h=jnp.where(accepted, h_acc, h_old),
            h_old=jnp.where(accepted, h_old, st.h_old),
            best_h=best_acc,
            se=jnp.where(accepted, se_acc, st.se),
            k=jnp.where(accepted, k_acc, st.k),
            sink_source=st.sink_source,
            pond=st.pond,
            boundary_flow_sum=jnp.where(accepted, new_bflow,
                                        st.boundary_flow_sum),
            link_flow_sum=new_link,
            dt_curr=out.dt_curr,
            courant=out.courant,
            balance_prev=jax.tree.map(
                lambda n, o: jnp.where(accepted, n, o), new_prev,
                st.balance_prev),
            balance_current=BalanceData(storage, sink, mbe, mbr),
            balance_period=jax.tree.map(
                lambda n, o: jnp.where(accepted, n, o), new_period,
                st.balance_period),
            balance_whole=st.balance_whole,
        )
        done = accepted | fatal
        na, nap, nsw = c.stats
        stats = (na + 1, nap + out.approx, nsw + out.n_sweeps)
        return _StepCarry(state=new_state,
                          dt_accepted=jnp.asarray(dt, dtype),
                          done=done, nan_flag=c.nan_flag | fatal,
                          stats=stats,
                          boundary_rate=out.boundary_rate.astype(
                              c.boundary_rate.dtype))

    z32 = jnp.zeros((), jnp.int32)
    init = _StepCarry(state=state, dt_accepted=jnp.zeros((), dtype),
                      done=jnp.zeros((), bool), nan_flag=jnp.zeros((), bool),
                      stats=(z32, z32, z32),
                      boundary_rate=jnp.zeros_like(state.h))
    final = lax.while_loop(lambda c: ~c.done, body, init)
    return final.state, final.dt_accepted, final.stats, final.boundary_rate


@partial(jax.jit, static_argnames=("params",))
def compute_step(grid: Grid, params: SolverParameters, state: WaterState,
                 max_time_step) -> tuple[WaterState, jax.Array]:
    """Advance the water state by one adaptive step (<= max_time_step [s]).

    Returns ``(new_state, dt_accepted)``. Reference: computeStep
    (soilFluxes3D.cpp:1785-1821) / CPUSolver::waterMainLoop.
    """
    max_ts = jnp.asarray(max_time_step, params.dtype)
    st, dt, _, _ = _compute_step(grid, params, state, max_ts)
    return st, dt


@partial(jax.jit, static_argnames=("params",))
def compute_period_stats(grid: Grid, params: SolverParameters,
                         state: WaterState, period_seconds,
                         start_seconds=0.0):
    """Like :func:`compute_period` but also returns solver-effort
    diagnostics ``(n_steps, n_attempts, n_approximations, n_sweeps)`` —
    the per-hour breakdown the benchmark reports.

    ``start_seconds`` > 0 RESUMES a partially-computed period (the
    reference's isRestart path, criteria3DProject.cpp:2020 +
    runWaterFluxes3DModel's ``currentSeconds``, project3D.cpp:1307-1360):
    the period sink counter is kept instead of reset and stepping
    continues from the checkpointed elapsed time."""
    dtype = params.dtype
    period = jnp.asarray(period_seconds, dtype)
    start = jnp.asarray(start_seconds, dtype)

    # reset the period sink/source counter — unless resuming mid-period
    bp = state.balance_period
    fresh = start <= 0.0
    state = dataclasses.replace(
        state,
        balance_period=BalanceData(
            bp.storage, jnp.where(fresh, 0.0, bp.sink_source),
            bp.mbe, bp.mbr))

    def cond(c):
        st, t, _ = c
        return t < period

    def body(c):
        st, t, acc = c
        st, dt, stats, _ = _compute_step(grid, params, st, period - t)
        acc = tuple(a + s for a, s in zip(acc, (jnp.ones((), jnp.int32),)
                                          + stats))
        return st, t + dt, acc

    z32 = jnp.zeros((), jnp.int32)
    state, _, stats = lax.while_loop(
        cond, body, (state, start, (z32, z32, z32, z32)))

    # close the period (water.cpp:143-156)
    cur, per, whole = state.balance_current, state.balance_period, state.balance_whole
    whole_sink = whole.sink_source + per.sink_source
    d_period = cur.storage - per.storage
    d_whole = cur.storage - whole.storage
    per_mbe = d_period - per.sink_source
    whole_mbe = d_whole - whole_sink
    # reference quirk: updateWaterBalanceDataWholePeriod (water.cpp:152)
    # omits the fabs() its per-step twin applies (water.cpp:118), so a
    # drainage-dominated period (net NEGATIVE sink) clamps the denominator
    # to 0.001 m3 and the whole-period MBR explodes by ~6 orders of
    # magnitude. We use |sink| (DEVIATIONS #30).
    ref = jnp.maximum(0.001, jnp.abs(whole_sink))
    whole_mbr = whole_mbe / ref

    state = dataclasses.replace(
        state,
        balance_period=BalanceData(cur.storage, per.sink_source, per_mbe, per.mbr),
        balance_whole=BalanceData(whole.storage, whole_sink, whole_mbe, whole_mbr),
    )
    return state, stats


@partial(jax.jit, static_argnames=("params",))
def compute_period(grid: Grid, params: SolverParameters, state: WaterState,
                   period_seconds) -> WaterState:
    """Run adaptive steps until ``period_seconds`` is covered (<= 1 hour in
    the reference app), then close the period balance.

    Reference: computePeriod (soilFluxes3D.cpp:1760-1777) +
    updateWaterBalanceDataWholePeriod (water.cpp:143-156).
    """
    state, _ = compute_period_stats(grid, params, state, period_seconds)
    return state
