"""Grapevine downy mildew (Plasmopara viticola) — VINE3D disease model.

Vectorised re-implementation of src/grapevine/downyMildew.cpp (Costantini
2013; Rossi et al. model): oospore dormancy breaking by hydrothermal time,
then a cohort state machine (germination → sporangia → zoospore release →
leaf infection → oil-spot symptoms).

The reference keeps a dynamic per-point cohort vector; here cohorts live in
a fixed pool of slots (stage 0 = free) so the whole map of points advances
in one element-wise pass per hour. All arrays have shape (..., N_SLOTS) or
(...); a scalar shape () runs a single point.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["DownyMildewState", "DownyMildewInput", "downy_mildew_step",
           "hydrothermal_time", "dormancy_breaking", "N_SLOTS"]

N_SLOTS = 16


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DownyMildewState:
    """Per-point model state; cohort arrays have a trailing slot axis."""

    htt: jax.Array            # hydrothermal time since Jan 1
    current_pmo: jax.Array    # physiologically mature oospores awaiting rain
    is_germination: jax.Array  # bool
    stage: jax.Array          # (..., N) int: 0 free, 1..5 active stages
    cohort: jax.Array         # (..., N) spore fraction of the cohort
    rate: jax.Array           # (..., N)
    wet_duration: jax.Array   # (..., N)
    sum_t: jax.Array          # (..., N)
    nr_hours: jax.Array       # (..., N)
    seq: jax.Array            # (..., N) insertion order (newest = max)
    seq_counter: jax.Array    # next sequence number

    @staticmethod
    def initialize(shape=(), dtype=jnp.float32) -> "DownyMildewState":
        z = lambda: jnp.zeros(shape, dtype)
        zn = lambda: jnp.zeros(shape + (N_SLOTS,), dtype)
        return DownyMildewState(
            htt=z(), current_pmo=z(),
            is_germination=jnp.zeros(shape, bool),
            stage=jnp.zeros(shape + (N_SLOTS,), jnp.int32),
            cohort=zn(), rate=zn(), wet_duration=zn(), sum_t=zn(),
            nr_hours=zn(), seq=zn(), seq_counter=z())


@dataclasses.dataclass
class DownyMildewInput:
    tair: jax.Array              # [degC]
    rain: jax.Array              # [mm]
    leaf_wetness: jax.Array      # 0/1
    relative_humidity: jax.Array  # [%]


def vapour_pressure_deficit(tair, rh):
    """[hPa] (physics.cpp vapourPressureDeficit)."""
    es = 6.112 * jnp.exp(17.67 * tair / (tair + 243.5))
    return es * (1.0 - jnp.clip(rh, 0.0, 100.0) / 100.0)


def leaf_litter_moisture(rain, vpd):
    """Dichotomic litter moisture (downyMildew.cpp:249-255)."""
    return jnp.where((rain > 0) | (vpd <= 4.5), 1.0, 0.0)


def hydrothermal_time(tair, llm):
    """(downyMildew.cpp:273-278)."""
    denom = 1330.1 - 116.19 * tair + 2.6256 * tair ** 2
    return jnp.where(tair <= 0.0, 0.0, llm / denom)


def dormancy_breaking(htt):
    """(downyMildew.cpp:295-298)."""
    return jnp.exp(-15.891 * jnp.exp(-0.653 * (htt + 1.0)))


def survival_rate_sporangia(tair, rh):
    """(downyMildew.cpp:316-324)."""
    rh = jnp.clip(rh, 1.0, 100.0) / 100.0
    x = tair * (1.0 - rh)
    return 1.0 / (24.0 * (5.67 - 0.47 * x + 0.01 * x ** 2))


def incubation(tair):
    """(downyMildew.cpp:341-344)."""
    return 1.0 / (24.0 * (45.1 - 3.45 * tair + 0.073 * tair ** 2))


def downy_mildew_step(state: DownyMildewState, inp: DownyMildewInput,
                      is_first_january=False):
    """One hourly step; returns (new_state, outputs dict).

    Mirrors downyMildew (downyMildew.cpp:20-226) with the cohort vector as a
    fixed slot pool.
    """
    if is_first_january:
        state = DownyMildewState.initialize(state.htt.shape, state.htt.dtype)

    tair = jnp.asarray(inp.tair, state.htt.dtype)
    rain = jnp.asarray(inp.rain, state.htt.dtype)
    wet = jnp.asarray(inp.leaf_wetness, state.htt.dtype)
    rh = jnp.asarray(inp.relative_humidity, state.htt.dtype)

    vpd = vapour_pressure_deficit(tair, rh)
    llm = leaf_litter_moisture(rain, vpd)

    prev_pmo = dormancy_breaking(state.htt)
    htt = state.htt + hydrothermal_time(tair, llm)
    sum_pmo = dormancy_breaking(htt)
    hourly_pmo = jnp.maximum(sum_pmo - prev_pmo, 0.0)

    # --- start a new germination cohort (downyMildew.cpp:64-83) ---
    can_germinate = ((htt >= 1.3) & (htt < 8.6) & (rain >= 0.2)
                     & (state.current_pmo >= 0.01) & ~state.is_germination)
    free = state.stage == 0
    has_free = jnp.any(free, axis=-1)
    first_free = jnp.argmax(free, axis=-1)
    start = can_germinate & has_free

    slot_idx = jax.lax.broadcasted_iota(jnp.int32, state.stage.shape,
                                        state.stage.ndim - 1)
    is_new = start[..., None] & (slot_idx == first_free[..., None])

    stage = jnp.where(is_new, 1, state.stage)
    cohort = jnp.where(is_new, state.current_pmo[..., None], state.cohort)
    rate = jnp.where(is_new, 0.0, state.rate)
    wet_dur = jnp.where(is_new, 0.0, state.wet_duration)
    sum_t = jnp.where(is_new, 0.0, state.sum_t)
    nr_hours = jnp.where(is_new, 0.0, state.nr_hours)
    seq_counter = jnp.where(start, state.seq_counter + 1.0,
                            state.seq_counter)
    seq = jnp.where(is_new, seq_counter[..., None], state.seq)

    current_pmo = jnp.where(start, 0.0, state.current_pmo)
    is_germ = jnp.where(start, True, state.is_germination)
    # first dry hour ends the germination event
    is_germ = jnp.where((llm == 0) & is_germ, False, is_germ)
    current_pmo = current_pmo + hourly_pmo

    tair_b = tair[..., None]
    rain_b = rain[..., None]
    wet_b = wet[..., None]
    rh_b = rh[..., None]
    llm_b = llm[..., None]

    out_infection = jnp.zeros_like(state.htt, dtype=bool)
    out_rate = jnp.zeros_like(state.htt)
    out_oil = jnp.zeros_like(state.htt)

    # --- STAGE 1: germination in the litter ---
    s1 = stage == 1
    rate = jnp.where(s1, rate + hydrothermal_time(tair_b, llm_b), rate)
    to_s2 = s1 & (rate >= 1.0)
    stage = jnp.where(to_s2, 2, stage)
    rate = jnp.where(to_s2, 0.0, rate)
    wet_dur = jnp.where(to_s2, 0.0, wet_dur)
    sum_t = jnp.where(to_s2, 0.0, sum_t)
    nr_hours = jnp.where(to_s2, 0.0, nr_hours)

    # --- STAGE 2: sporangia survival / zoospore maturation ---
    s2 = (stage == 2) & ~to_s2
    rate = jnp.where(s2, rate + survival_rate_sporangia(tair_b, rh_b), rate)
    dead2 = s2 & (rate > 1.0)
    active2 = s2 & ~dead2 & (wet_b > 0)
    nr_hours = jnp.where(active2, nr_hours + 1, nr_hours)
    wet_dur = jnp.where(active2, wet_dur + wet_b, wet_dur)
    sum_t = jnp.where(active2, sum_t + tair_b, sum_t)
    avg_t = sum_t / jnp.maximum(nr_hours, 1.0)
    zre_thresh = jnp.exp(-1.022 + 19.634 / jnp.maximum(avg_t, 0.1))
    to_s3 = active2 & (wet_dur >= zre_thresh)
    stage = jnp.where(to_s3, 3, stage)
    wet_dur = jnp.where(to_s3, 0.0, wet_dur)
    nr_hours = jnp.where(to_s3, 0.0, nr_hours)

    # --- STAGE 3: zoospores released, need continued wetness + splash rain ---
    s3 = (stage == 3) & ~to_s3
    wet_dur = jnp.where(s3, wet_dur + wet_b, wet_dur)
    nr_hours = jnp.where(s3, nr_hours + 1, nr_hours)
    dead3 = s3 & ((nr_hours - wet_dur) > 1)
    to_s4 = s3 & ~dead3 & (rain_b > 0.2)
    stage = jnp.where(to_s4, 4, stage)
    wet_dur = jnp.where(to_s4, 1.0, wet_dur)
    sum_t = jnp.where(to_s4, tair_b, sum_t)
    nr_hours = jnp.where(to_s4, 1.0, nr_hours)

    # --- STAGE 4: zoospores on leaves -> infection ---
    s4 = (stage == 4) & ~to_s4
    wet_dur = jnp.where(s4, wet_dur + wet_b, wet_dur)
    nr_hours = jnp.where(s4, nr_hours + 1, nr_hours)
    dead4 = s4 & ((nr_hours - wet_dur) > 1)
    alive4 = s4 & ~dead4
    sum_t = jnp.where(alive4, sum_t + tair_b, sum_t)
    avg_t4 = sum_t / jnp.maximum(nr_hours, 1.0)
    wdtwd = avg_t4 * wet_dur
    infect = alive4 & (wdtwd >= 60.0)
    stage = jnp.where(infect, 5, stage)
    rate = jnp.where(infect, 0.0, rate)
    out_infection = out_infection | jnp.any(infect, axis=-1)
    out_rate = out_rate + jnp.sum(jnp.where(infect, cohort, 0.0), axis=-1)

    # --- STAGE 5: incubation -> oil spots ---
    s5 = (stage == 5) & ~infect
    rate = jnp.where(s5, rate + incubation(tair_b), rate)
    done5 = s5 & (rate > 1.0)
    # REFERENCE QUIRK reproduced: downyMildew.cpp:213 ASSIGNS
    # output.oilSpots = cohort (no +=), so when several cohorts finish
    # incubation the same hour only the LAST one in the vector — the
    # NEWEST, by push_back order — is reported. Select by max insertion
    # sequence among finishers; oil_spots_total carries the physical sum.
    oil_total = jnp.sum(jnp.where(done5, cohort, 0.0), axis=-1)
    newest = jnp.max(jnp.where(done5, seq, -1.0), axis=-1, keepdims=True)
    out_oil = out_oil + jnp.sum(
        jnp.where(done5 & (seq == newest), cohort, 0.0), axis=-1)
    out_rate = out_rate + jnp.sum(jnp.where(s5 & ~done5, cohort, 0.0), axis=-1)

    # free dead/completed slots
    gone = dead2 | dead3 | dead4 | done5
    stage = jnp.where(gone, 0, stage)

    new_state = DownyMildewState(
        htt=htt, current_pmo=current_pmo, is_germination=is_germ,
        stage=stage, cohort=cohort, rate=rate, wet_duration=wet_dur,
        sum_t=sum_t, nr_hours=nr_hours, seq=seq, seq_counter=seq_counter)
    outputs = dict(is_infection=out_infection, infection_rate=out_rate,
                   oil_spots=out_oil, oil_spots_total=oil_total,
                   mmo=1.0 - sum_pmo)
    return new_state, outputs
