"""Coupled water + heat stepping.

Mirrors computeStep's heat sub-stepping driver (soilFluxes3D.cpp:1785-1821 +
CPUSolver::run, cpusolver.cpp:77-91): each accepted water step of length
dtWater is covered by heat sub-steps dtHeat <= dtWater, each Courant-limited
by the atmospheric boundary flux (updateBoundaryHeatData, heat.cpp:237-341)
and halved when the heat balance fails (|heatMBR| > 1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from criteria3d_tpu.core.grid import Grid
from criteria3d_tpu.core.state import SolverParameters, WaterState
from criteria3d_tpu.solver import heat as H
from criteria3d_tpu.solver.step import _compute_step

__all__ = ["compute_step_coupled", "compute_period_coupled"]


@partial(jax.jit, static_argnames=("params", "max_substeps"))
def compute_step_coupled(grid: Grid, params: SolverParameters,
                         water: WaterState, heat_state: H.HeatState,
                         boundary: H.HeatBoundary, max_time_step,
                         max_substeps: int = 256):
    """One adaptive water step followed by its heat sub-steps.

    Returns (water', heat', dt_water). The heat sub-step loops run on
    device with safety caps far above any observed need; unlike the
    round-3 version they always cover the full water step (see the chunk
    structure below).
    """
    # temperature-gradient water fluxes (thermal liquid + vapor) enter the
    # water RHS while heat is active, re-evaluated at EVERY Picard
    # iteration from the current (h, k) iterate — the invariantFluxes
    # mechanism (computeLinkFluxes water.cpp:329-341, RHS add
    # cpusolver.cpp:388). Like the reference, they are excluded from the
    # balance sink sums (computeWaterSinkSourceFlowsSum reads waterFlow
    # only).
    frozen_props = params.heat_frozen_props \
        and params.sweep_dtype is not None \
        and params.sweep_dtype != params.dtype
    if frozen_props:
        # heat_frozen_props: the flux's DRIVING gradient (the step-start
        # T field) is already frozen for the whole water step; freezing
        # the conductivities at the step-start (psi, k) as well makes
        # the term a constant of the step — the full-resolution device
        # trace showed its per-Picard-iteration vapor-conductivity
        # chains as the single largest cost of the coupled hour
        # (~17 s/hour, 4 transcendental full-field fusions x ~170
        # assemblies). The psi-lag deviation is bounded by the
        # measured heat_frozen_props envelope (test_frozen_props_envelope).
        sd = params.sweep_dtype
        psi0 = (water.h - grid.z).astype(sd)
        tw_frozen = H.thermal_water_flux(grid, params, heat_state, psi0,
                                         water.k.astype(sd))

        def thermal_flux(psi, k):
            return tw_frozen
    else:
        def thermal_flux(psi, k):
            return H.thermal_water_flux(grid, params, heat_state, psi, k)

    # conductances are FROZEN once per computeStep from the start-of-step
    # state (updateConductance before the water solve, heat.cpp:214-236 +
    # soilFluxes3D.cpp:1789-1790) and shared by every boundary evaluation
    conduct = H.surface_conductances(grid, params, heat_state, boundary,
                                     water.h)

    # the HeatSurface evaporative water boundary, re-evaluated per Picard
    # iteration exactly like the reference's updateBoundaryWaterData
    # HeatSurface branch (water.cpp:708-747)
    evap_flux = None
    if params.heat_vapor:
        def evap_flux(psi, dt):
            return H.heat_surface_water_sink(grid, params, heat_state,
                                             boundary, psi, dt,
                                             conductances=conduct)

    water_new, dt_water, _, boundary_rate = _compute_step(
        grid, params, water, jnp.asarray(max_time_step, params.dtype),
        extra_flux_fn=thermal_flux, boundary_flux_fn=evap_flux)
    # the heat boundary's latent flux reads the evaporative water rate of
    # the water step's LAST assembly (boundaryData.waterFlowRate,
    # computeNodeAtmosphericLatentHeatFlux heat.cpp:957-966) — at a
    # HeatSurface layer-1 node boundary_rate IS exactly that rate
    evap_rate_frozen = boundary_rate[1] if params.heat_vapor else None

    # --- heat sub-stepping, the reference's exact two-level structure ---
    # OUTER loop over boundary chunks (computeStep, soilFluxes3D.cpp:
    # 1805-1818): updateBoundaryHeatData evaluates the boundary heat flux
    # + Courant limit ONCE per chunk, at chunk-start temperatures; the
    # flux is FROZEN for every sub-step inside the chunk.
    # INNER loop (CPUSolver::run Heat, cpusolver.cpp:77-91): halve freely
    # on |heatMBR| > 1 (no dtMin floor on the halving) until accepted —
    # heatLoop accepts-as-is once dtHeat <= 10*dtMin — and ALWAYS cover
    # the full chunk.  (The round-3 version re-evaluated the boundary
    # flux per sub-step and capped the total sub-step count, silently
    # dropping unintegrated time in failure cascades — the actual root
    # cause of the vapor-path parity gap, DEVIATIONS #22.)
    # The loops below carry ONLY (t, storage_prev, sink_whole, mbr) plus
    # control scalars — t_old is identical to t throughout this driver
    # (heat_step sets both from the same accepted value, initialize_heat
    # starts them equal) and sink_source / storage_whole never change, so
    # carrying the full HeatState would copy three extra full fields per
    # while iteration (the dominant cost of the round-4 coupled hour
    # after the balance hoist: carry copy-starts were ~35% of device
    # time at coarsen 8).
    import dataclasses as _dc

    def with_t(t_field, storage_prev, sink_whole, mbr):
        return _dc.replace(heat_state, t=t_field, t_old=t_field,
                           storage_prev=storage_prev,
                           sink_whole=sink_whole, mbr=mbr)

    # Carry dtype for the temperature field. An f32 carry is LOSSLESS in
    # frozen mode (every accepted T comes out of the f32 sweep solve) and
    # was tried to halve the x2-per-chunk carry copy-starts seen in the
    # trace — but MEASURED SLOWER at full resolution (19.4 vs 18.2
    # s/sim-hour: the f32<->f64 boundary casts cost more than the copy
    # saving), so the carry stays in the state dtype.
    carry_dtype = params.dtype

    def outer_cond(c):
        t_f, sp, sw, mbr, t_sum, dt_pref, it = c
        return jnp.logical_and(t_sum < dt_water, it < max_substeps)

    def outer_body(c):
        t_f, sp, sw, mbr, t_sum, dt_pref, it = c
        t_f64 = t_f.astype(params.dtype)
        chunk_max = jnp.minimum(dt_pref, dt_water - t_sum)
        flow, chunk, _ = H.update_boundary_heat(
            grid, params, with_t(t_f64, sp, sw, mbr), boundary, water_new,
            chunk_max, dt_water,
            conductances=conduct, evap_rate=evap_rate_frozen)
        # the chunk's frozen boundary flow sum (the sink side of every
        # sub-step balance) and the sub-step-invariant f64 energy factors
        # are hoisted out of the sub-step loop; the cache is keyed on the
        # sub-step length and only rebuilt when a halving or a final
        # partial sub-step changes it (see H.energy_invariants)
        flow_sum = jnp.sum(jnp.where(grid.mask.at[0].set(False), flow, 0.0))

        frozen = params.heat_frozen_props and params.sweep_dtype is not None \
            and params.sweep_dtype != params.dtype
        t_chunk = t_f   # chunk-start temperatures (heat_frozen_props)

        def make_cache(dt_h):
            return H.energy_invariants(grid, params, water_new, dt_h,
                                       dt_water)

        if frozen:
            # the frozen factors are dt-INDEPENDENT (the sub-step folds
            # its dt in with cheap element-wise passes), so the heavy
            # property assembly runs exactly once per chunk — no lax.cond
            # keyed on the sub-step length (whose halving churn rebuilt it
            # nearly every sub-step in the first round-5 cut)
            inv0 = make_cache(chunk)
            fzsys = H.chunk_frozen_system(grid, params, t_chunk, water_new,
                                          chunk, dt_water, flow, flow_sum,
                                          inv0)

            def inner_cond(ci):
                t_i, sp_i, sw_i, mbr_i, t_in, dt_h, it_in = ci
                return jnp.logical_and(t_in < chunk, it_in < 4096)

            def inner_body(ci):
                t_i, sp_i, sw_i, mbr_i, t_in, dt_h, it_in = ci
                dt_try = jnp.minimum(dt_h, chunk - t_in)
                t_i, sp_i, sw_i, mbr_i, ok = H.heat_substep_frozen(
                    grid, params, fzsys, t_i, sp_i, sw_i, dt_try)
                t_next = jnp.where(ok, t_in + dt_try, t_in)
                dt_next = jnp.where(ok, dt_h, dt_try * 0.5)
                return (t_i, sp_i, sw_i, mbr_i, t_next, dt_next, it_in + 1)

            t_f2, sp, sw, mbr, _, _, _ = lax.while_loop(
                inner_cond, inner_body,
                (t_f, sp, sw, mbr, jnp.zeros((), params.dtype), chunk,
                 jnp.zeros((), jnp.int32)))
            return (t_f2, sp, sw, mbr, t_sum + chunk, chunk, it + 1)

        def inner_cond(ci):
            t_i, sp_i, sw_i, mbr_i, t_in, dt_h, it_in, cache_dt, cache = ci
            return jnp.logical_and(t_in < chunk, it_in < 4096)

        def inner_body(ci):
            t_i, sp_i, sw_i, mbr_i, t_in, dt_h, it_in, cache_dt, cache = ci
            dt_try = jnp.minimum(dt_h, chunk - t_in)
            cache = lax.cond(dt_try == cache_dt,
                             lambda _: cache, make_cache, dt_try)
            new_heat, mbr2 = H.heat_step(
                grid, params, with_t(t_i, sp_i, sw_i, mbr_i), boundary,
                water_new, dt_try, dt_water,
                conductances=conduct, evap_rate=evap_rate_frozen,
                heat_flow=flow, energy_cache=cache, flow_sum=flow_sum)
            ok = (jnp.abs(mbr2) <= 1.0) \
                | (dt_try <= params.delta_t_min * 10.0)
            t_i, sp_i, sw_i, mbr_i = (new_heat.t, new_heat.storage_prev,
                                      new_heat.sink_whole, new_heat.mbr)
            t_next = jnp.where(ok, t_in + dt_try, t_in)
            dt_next = jnp.where(ok, dt_h, dt_try * 0.5)
            return (t_i, sp_i, sw_i, mbr_i, t_next, dt_next, it_in + 1,
                    dt_try, cache)

        t_f2, sp, sw, mbr, _, _, _, _, _ = lax.while_loop(
            inner_cond, inner_body,
            (t_f, sp, sw, mbr, jnp.zeros((), params.dtype), chunk,
             jnp.zeros((), jnp.int32), chunk, make_cache(chunk)))
        return (t_f2, sp, sw, mbr, t_sum + chunk, chunk, it + 1)

    t_f, sp, sw, mbr, _, _, _ = lax.while_loop(
        outer_cond, outer_body,
        (heat_state.t.astype(carry_dtype), heat_state.storage_prev,
         heat_state.sink_whole, heat_state.mbr,
         jnp.zeros((), params.dtype), dt_water,
         jnp.zeros((), jnp.int32)))
    return (water_new, with_t(t_f.astype(params.dtype), sp, sw, mbr),
            dt_water)


@partial(jax.jit, static_argnames=("params", "max_substeps"))
def compute_period_coupled(grid: Grid, params: SolverParameters,
                           water: WaterState, heat_state: H.HeatState,
                           boundary: H.HeatBoundary, period,
                           max_substeps: int = 256):
    """Advance coupled water+heat over a whole period (computePeriod with
    computeHeat active, soilFluxes3D.cpp:1760-1821), closing the period
    water balance exactly as :func:`criteria3d_tpu.solver.step.compute_period`
    does (water.cpp:143-156)."""
    import dataclasses as _dc

    from criteria3d_tpu.core.state import BalanceData

    period = jnp.asarray(period, params.dtype)

    # reset the period sink/source counter (computePeriod,
    # soilFluxes3D.cpp:1764)
    bp = water.balance_period
    water = _dc.replace(
        water,
        balance_period=BalanceData(bp.storage, jnp.zeros((), params.dtype),
                                   bp.mbe, bp.mbr))

    def cond(c):
        w, h, t = c
        return t < period

    def body(c):
        w, h, t = c
        w2, h2, dt = compute_step_coupled(grid, params, w, h, boundary,
                                          period - t,
                                          max_substeps=max_substeps)
        return w2, h2, t + dt

    water, heat_state, _ = lax.while_loop(
        cond, body, (water, heat_state, jnp.zeros((), params.dtype)))

    cur, per, whole = (water.balance_current, water.balance_period,
                       water.balance_whole)
    whole_sink = whole.sink_source + per.sink_source
    d_period = cur.storage - per.storage
    d_whole = cur.storage - whole.storage
    per_mbe = d_period - per.sink_source
    whole_mbe = d_whole - whole_sink
    ref = jnp.maximum(0.001, whole_sink)
    whole_mbr = whole_mbe / ref

    water = _dc.replace(
        water,
        balance_period=BalanceData(cur.storage, per.sink_source, per_mbe,
                                   per.mbr),
        balance_whole=BalanceData(whole.storage, whole_sink, whole_mbe,
                                  whole_mbr))
    return water, heat_state
