"""VINE3D grapevine ecophysiology: phenology, growth, berry quality.

Vectorised re-implementation of the core of src/grapevine/grapevine.cpp
(Bindi-Miglietta growth + PhenoVitis phenology, Caffarra & Eccel):

* chilling / forcing phenology with the staged cycle endodormancy →
  ecodormancy → bud burst → flowering → fruit set → veraison →
  physiological maturity (computePhenology, grapevine.cpp:1393-1460);
* Bindi-Miglietta shoot-leaf-number LAI dynamics (getLAIVine,
  grapevine.cpp:~1700);
* fruit biomass accumulation from net assimilation with the
  days-after-bloom incremental ratio (compute, grapevine.cpp:69-92);
* berry quality: Gompertz berry volume → tartaric acid
  (grapevine.cpp:1840-1861).

Photosynthesis/transpiration live in
:mod:`criteria3d_tpu.physics.vine_photosynthesis` (the vine-specific
sun/shade Wang-Leuning stack, grapevine.cpp:385-1020, parity-tested
against the compiled reference).

All functions are element-wise over arbitrary map shapes; stages are carried
as a float (integer part = stage, fraction = progress), exactly like the
reference's ``statePheno.stage``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from criteria3d_tpu.constants import NODATA

__all__ = ["GrapevineParameters", "GrapevineState", "phenology_daily_step",
           "update_thermal_sum", "lai_vine_daily", "fruit_biomass_step",
           "tartaric_acid", "Stage"]


class Stage:
    """Phenological stage codes (grapevine.h vine stages)."""

    ENDO_DORMANCY = 0.0
    ECO_DORMANCY = 1.0
    BUD_BURST = 2.0
    FLOWERING = 3.0
    FRUIT_SET = 4.0
    VERAISON = 5.0
    PHYSIOLOGICAL_MATURITY = 6.0
    SENESCENCE = 7.0


@dataclasses.dataclass(frozen=True)
class GrapevineParameters:
    """Cultivar parameters (TVineCultivar; defaults ~ Sangiovese)."""

    # PhenoVitis — defaults = the fields DB 'default' cultivar row
    # (vine3DProject.cpp:240-263 column mapping)
    critical_chilling: float = 78.69
    co1: float = 176.26        # phenovitis_ecodormancy
    co2: float = -0.015        # parameterPhenoVitisFix.co2 (grapevine.cpp:283)
    chilling_a: float = 0.005  # parameterPhenoVitisFix.a
    optimal_chilling_temp: float = 2.8
    critical_force_flowering: float = 24.71
    critical_force_fruitset: float = 34.71
    critical_force_veraison: float = 75.86
    critical_force_maturity: float = 95.71
    degree_days_veraison: float = 2547.0
    starting_doy: int = 244    # phenology year restart (1 Sep)
    # Bindi-Miglietta
    bm_a: float = -0.28
    bm_b: float = 0.04
    bm_c: float = -0.015
    shaded_surface: float = 0.8
    leaf_d: float = 0.0018     # shoot leaf area = d * N^f
    leaf_f: float = 1.34
    shoots_per_plant: float = 10.0
    plant_density: float = 3333.0
    fruit_biomass_offset: float = 0.25
    fruit_biomass_slope: float = 0.01
    lai_min: float = 0.2
    lai_max: float = 6.0
    min_shoot_leaf_nr: float = 1.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GrapevineState:
    stage: jax.Array              # float stage code
    chilling: jax.Array
    force_bud_burst: jax.Array
    force_veg: jax.Array
    lai: jax.Array
    shoot_leaf_number: jax.Array
    fruit_biomass: jax.Array      # [g m-2]
    cumulated_biomass: jax.Array  # [g m-2]
    days_after_bloom: jax.Array
    dd_march: jax.Array           # [DD] thermal sum from 1 March (NODATA out)
    dd_fruit_set: jax.Array       # [DD] thermal sum latched at fruit set
    brix: jax.Array               # [Brix] berry sugar (NODATA out of season)
    potential_brix: jax.Array     # [Brix] radiation-driven ceiling

    @staticmethod
    def initialize(shape=(), dtype=jnp.float64) -> "GrapevineState":
        f = lambda v: jnp.full(shape, v, dtype)
        return GrapevineState(
            stage=f(Stage.ENDO_DORMANCY), chilling=f(86.267),
            force_bud_burst=f(0.415), force_veg=f(0.0), lai=f(0.2),
            shoot_leaf_number=f(1.0), fruit_biomass=f(0.0),
            cumulated_biomass=f(0.0), days_after_bloom=f(0.0),
            dd_march=f(NODATA), dd_fruit_set=f(NODATA), brix=f(NODATA),
            potential_brix=f(25.0))


def chilling_rate(temp, a, c_opt):
    """(grapevine.cpp:1357-1360)."""
    return 2.0 / (1.0 + jnp.exp(a * (temp - c_opt) ** 2))


def force_increment(temp):
    """Daily forcing unit (forceStateFunction, grapevine.cpp:1367-1369)."""
    return 1.0 / (1.0 + jnp.exp(-0.26 * (temp - 16.06)))


def update_thermal_sum(state: "GrapevineState", mean_daily_temp,
                       after_first_march) -> "GrapevineState":
    """Daily thermal-sum bookkeeping the VINE3D app performs BEFORE the
    phenology step (updateThermalSum, bin/VINE3D/plant.cpp:378-420):
    degree days from 1 March accumulate max(0, Tavg); the thermal sum at
    fruit set is latched the first day the stage reaches fruitSet; outside
    the March-November window the sum is NODATA."""
    t = jnp.asarray(mean_daily_temp)
    is_fruit_set = state.stage >= Stage.FRUIT_SET
    dd_fs = jnp.where(is_fruit_set & (state.dd_fruit_set == NODATA),
                      state.dd_march, state.dd_fruit_set)
    dd = jnp.where(state.dd_march == NODATA,
                   jnp.maximum(0.0, t),
                   state.dd_march + jnp.maximum(0.0, t))
    dd = jnp.where(jnp.asarray(after_first_march), dd, NODATA)
    return dataclasses.replace(state, dd_march=dd, dd_fruit_set=dd_fs)


def phenology_daily_step(state: GrapevineState, params: GrapevineParameters,
                         mean_daily_temp, doy) -> GrapevineState:
    """One daily PhenoVitis step — the EXACT computePhenology state
    machine (grapevine.cpp:1393-1460, parity vs the compiled reference in
    tests/test_grapevine_parity.py::test_phenology_*):

    * chilling resets on ``starting_doy`` and accumulates the chilling
      rate; stage = endo + min(1, chill/critChill);
    * once chilled, the bud-burst forcing accumulates the plain logistic
      and stage = eco + min(1, 1 - (critF - F)/critF) with the
      chilling-dependent critF = co1*exp(co2*chill);
    * past bud burst the VEGETATIVE forcing accumulates
      forceStateFunction(F, T, ddVeraison) — logistic plus the late-season
      cold correction once the thermal sum passes ddVeraison
      (grapevine.cpp:1367-1385) — and the stage interpolates through the
      flowering / fruit-set / veraison sub-segments, with the fruit-set ->
      veraison leg driven by the MIXED degree-days model
      (dd from 1 March vs the latched dd at fruit set);
    * berry brix = min(potential, 0.28*(F - critVeraison) + 11.5) between
      veraison and senescence;
    * 15 November (doy 320) hard-resets to endodormancy.
    """
    t = jnp.asarray(mean_daily_temp)

    # entry reset while still in endodormancy (grapevine.cpp:1398-1416):
    # growth state and the thermal sums are cleared every day until the
    # stage passes ecodormancy
    pre_eco = state.stage < Stage.ECO_DORMANCY
    state = dataclasses.replace(
        state,
        cumulated_biomass=jnp.where(pre_eco, 0.0, state.cumulated_biomass),
        fruit_biomass=jnp.where(pre_eco, 0.0, state.fruit_biomass),
        lai=jnp.where(pre_eco, 0.01, state.lai),           # LAIMIN
        shoot_leaf_number=jnp.where(pre_eco, params.min_shoot_leaf_nr,
                                    state.shoot_leaf_number),
        days_after_bloom=jnp.where(pre_eco, 0.0, state.days_after_bloom),
        dd_fruit_set=jnp.where(pre_eco, NODATA, state.dd_fruit_set),
        dd_march=jnp.where(pre_eco, NODATA, state.dd_march))

    chill = jnp.where(doy == params.starting_doy, 0.0,
                      state.chilling + chilling_rate(
                          t, params.chilling_a, params.optimal_chilling_temp))

    stage = Stage.ENDO_DORMANCY + jnp.minimum(
        1.0, chill / params.critical_chilling)

    chilled = chill > params.critical_chilling
    force_bb = jnp.where(chilled,
                         state.force_bud_burst + force_increment(t),
                         state.force_bud_burst)
    critical_force = params.co1 * jnp.exp(params.co2 * chill)
    stage = jnp.where(
        chilled,
        Stage.ECO_DORMANCY + jnp.minimum(
            1.0, 1.0 - (critical_force - force_bb)
            / jnp.maximum(critical_force, 1e-9)),
        stage)

    # NB upstream reads criticalForceStateBudBurst UNINITIALIZED when the
    # chilling requirement is not yet met (grapevine.cpp:1446 — the local
    # is only assigned inside the chilled branch); guarded here.
    burst = chilled & (force_bb > critical_force)

    # vegetative forcing: logistic + late-season cold correction
    # (forceStateFunction(force, T, ddVeraison), grapevine.cpp:1367-1385)
    f_inc = force_increment(t)
    late = (state.dd_march > params.degree_days_veraison) \
        & (state.dd_march != NODATA) & (state.days_after_bloom < 100.0)
    b = jnp.where(t < 14.5, 5.0, 1.2)
    cold_corr = -0.05 + 0.33 / (1.0 + jnp.abs((t - 14.5) / 4.0) ** (2.0 * b))
    force_veg = jnp.where(
        burst, state.force_veg + f_inc + jnp.where(late, cold_corr, 0.0),
        state.force_veg)

    # sub-segment stage interpolation (grapevine.cpp:1458-1494)
    crit_fl = params.critical_force_flowering
    crit_fs = params.critical_force_fruitset
    crit_ver = params.critical_force_veraison
    crit_mat = params.critical_force_maturity

    stage_bb = Stage.BUD_BURST + force_veg / crit_fl
    stage_fl = Stage.FLOWERING + (force_veg - crit_fl) / (crit_fs - crit_fl)
    # fruit set -> veraison: the mixed degree-days model
    stage_fs = jnp.where(
        state.dd_fruit_set == NODATA,
        jnp.asarray(Stage.FRUIT_SET, t.dtype),
        Stage.FRUIT_SET + (state.dd_march - state.dd_fruit_set)
        / jnp.maximum(params.degree_days_veraison - state.dd_fruit_set,
                      1e-9))
    stage_ver = Stage.VERAISON + (force_veg - crit_ver) \
        / (crit_mat - crit_ver)
    stage_ver = jnp.minimum(stage_ver, Stage.SENESCENCE)

    stage_veg = jnp.where(
        force_veg > crit_ver, stage_ver,
        jnp.where(force_veg > crit_fs, stage_fs,
                  jnp.where(force_veg > crit_fl, stage_fl, stage_bb)))
    # the fruit-set DD model saturates the vegetative forcing at veraison
    # (grapevine.cpp:1472-1474)
    force_veg = jnp.where(burst & (force_veg > crit_fs)
                          & (force_veg <= crit_ver)
                          & (stage_veg >= Stage.VERAISON),
                          crit_ver, force_veg)
    stage = jnp.where(burst, stage_veg, stage)

    # berry brix between veraison and senescence (grapevine.cpp:1496-1520)
    in_berry = (stage >= Stage.VERAISON) & (stage < Stage.SENESCENCE)
    brix = jnp.where(in_berry,
                     jnp.minimum(state.potential_brix,
                                 0.28 * (force_veg - crit_ver) + 11.5),
                     NODATA)

    # days after bloom (compute(), grapevine.cpp:94-99)
    dab = jnp.where(stage >= Stage.FLOWERING, state.days_after_bloom + 1.0,
                    state.days_after_bloom)

    # 15 November reset (grapevine.cpp:1522-1532)
    nov15 = doy == 320
    stage = jnp.where(nov15, Stage.ENDO_DORMANCY, stage)
    force_bb = jnp.where(nov15, 0.0, force_bb)
    force_veg = jnp.where(nov15, 0.0, force_veg)
    brix = jnp.where(nov15, NODATA, brix)
    dd_fs = jnp.where(nov15, NODATA, state.dd_fruit_set)
    dd_march = jnp.where(nov15, NODATA, state.dd_march)
    # (the bloom counter resets in the ENTRY block of the next call once
    # the stage has fallen below ecodormancy, grapevine.cpp:1398-1411)

    return dataclasses.replace(state, stage=stage, chilling=chill,
                               force_bud_burst=force_bb, force_veg=force_veg,
                               days_after_bloom=dab, brix=brix,
                               dd_fruit_set=dd_fs, dd_march=dd_march)


def lai_vine_daily(state: GrapevineState, params: GrapevineParameters,
                   mean_daily_temp, doy, stress_coefficient=1.0
                   ) -> GrapevineState:
    """Daily Bindi-Miglietta LAI update (getLAIVine)."""
    veg = state.stage >= Stage.BUD_BURST
    n = jnp.maximum(state.shoot_leaf_number, params.min_shoot_leaf_nr)

    rate = jnp.maximum(
        0.0, (params.bm_a + params.bm_b * mean_daily_temp)
        * (1.0 + params.bm_c * n))
    rate = jnp.where(doy < 260, rate, 0.0)
    ripening = (state.stage >= Stage.VERAISON) \
        & (state.stage <= Stage.PHYSIOLOGICAL_MATURITY)
    rate = jnp.where(
        ripening,
        rate * (1.0 - (params.fruit_biomass_offset
                       + params.fruit_biomass_slope * state.days_after_bloom)),
        rate)

    n_new = jnp.where(veg, n + rate, n)
    shoot_leaf_area = params.leaf_d * n_new ** params.leaf_f
    lai_unstressed = shoot_leaf_area * params.shoots_per_plant \
        * params.plant_density / params.shaded_surface

    delta = jnp.maximum(0.0, lai_unstressed - state.lai) * stress_coefficient
    lai = jnp.minimum(state.lai + delta, params.lai_max)

    # senescence decay toward LAImin after maturity / mid autumn
    decay = (state.stage >= Stage.PHYSIOLOGICAL_MATURITY) | (doy > 273)
    delta_doy = jnp.maximum(320 - doy, 1)
    lai = jnp.where(decay,
                    jnp.maximum(lai * (1.0 - 1.0 / delta_doy), params.lai_min),
                    lai)
    lai = jnp.where(veg, lai, params.lai_min)

    return dataclasses.replace(state, lai=lai, shoot_leaf_number=n_new)


def fruit_biomass_step(state: GrapevineState, params: GrapevineParameters,
                       net_assimilation_g) -> GrapevineState:
    """Allocate net assimilation to total and fruit biomass.

    Mirrors compute (grapevine.cpp:69-92): after fruit set, the fruit share
    of new biomass follows offset + slope·min(80, daysAfterBloom-5).
    """
    dab = state.days_after_bloom
    ratio = params.fruit_biomass_slope * params.shoots_per_plant / 11.0
    partition = params.fruit_biomass_offset + ratio * jnp.minimum(
        80.0, jnp.maximum(dab - 5.0, 0.0))

    fruiting = (dab >= 5.0) & (state.stage <= Stage.PHYSIOLOGICAL_MATURITY) \
        & (state.stage >= Stage.FRUIT_SET)
    fruit = jnp.where(fruiting,
                      state.fruit_biomass + net_assimilation_g * partition,
                      state.fruit_biomass)
    total = state.cumulated_biomass + jnp.maximum(net_assimilation_g, 0.0)
    return dataclasses.replace(state, fruit_biomass=fruit,
                               cumulated_biomass=total)


def gompertz_berry_volume(stage_from_veraison):
    """(gompertzDistribution, grapevine.cpp:1853-1861)."""
    a = 2.5
    b = jnp.log(a)
    c = -jnp.log(-jnp.log(0.76) / b)
    return a * jnp.exp(-b * jnp.exp(-c * stage_from_veraison))


def tartaric_acid(state: GrapevineState):
    """[g/L]-scale index, diluted by berry growth (getTartaricAcid,
    grapevine.cpp:1840-1851). NaN before veraison."""
    past = state.stage >= Stage.VERAISON
    vol = gompertz_berry_volume(
        jnp.maximum(state.stage - Stage.VERAISON, 0.0) + 0.2)
    return jnp.where(past, 1.0 / vol, jnp.nan)


# ----------------------------------------------------------------------
# training systems + root density profiles (grapevine.h:183-210,
# grapevine.cpp:1192-1280, 1656-1690)
# ----------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TrainingSystem:
    """TtrainingSystem (grapevine.h:183-190) — the fields.db
    ``training_system`` table (VINE3D_test/DATA/fields.db schema)."""

    id: int = 0
    name: str = "default"
    shoots_per_plant: float = 8.0
    row_width: float = 0.4
    row_height: float = 1.5
    row_distance: float = 3.0
    plant_distance: float = 1.0

    @property
    def plant_density(self) -> float:
        """plants per m2 (readFieldQuery, vine3DProject.cpp:629)."""
        return 1.0 / (self.row_distance * self.plant_distance)

    @property
    def shaded_surface(self) -> float:
        """canopy-shaded ground fraction (row footprint / row spacing)."""
        return self.row_width / self.row_distance


def vine_root_density(n_layers: int, n_layers_with_root: int,
                      n_upper_layers_without_root: int = 1,
                      shape_factor: float = 2.0) -> np.ndarray:
    """Cardioid ("lunette") vine root density profile, normalised to 1.

    Exactly reproduces Vine3D_Grapevine::setRootDensity's
    CARDIOID_DISTRIBUTION branch (grapevine.cpp:1192-1242): half-moon areas
    of the unit cardioid per layer, deformed by an exponential with the
    shape factor, folded symmetric halves.
    """
    nr = n_layers_with_root
    lunette = np.zeros(nr)
    for i in range(nr):
        sin_a = 1.0 - (1 + i) / nr
        cos_a = max(np.sqrt(1.0 - sin_a ** 2), 1e-4)
        alfa = np.arctan2(sin_a, cos_a)
        lunette[i] = ((np.pi / 2) - alfa - sin_a * cos_a) / np.pi
    density = np.zeros(2 * nr)
    density[0] = density[2 * nr - 1] = lunette[0]
    for i in range(1, nr):
        density[i] = density[2 * nr - i - 1] = lunette[i] - lunette[i - 1]

    li_min = -np.log(0.2) / nr
    li_max = -np.log(0.05) / nr
    k = li_min + (li_max - li_min) * (shape_factor - 1.0)
    density *= np.exp(-k * (np.arange(2 * nr) + 0.5))
    density /= density.sum()

    roots = np.zeros(n_layers)
    for i in range(nr):
        li = n_upper_layers_without_root + i
        if li < n_layers:
            roots[li] = density[2 * i] + density[2 * i + 1]
    return roots


def trapezoid_root_density(layer_depth, layer_thickness,
                           start_root_depth: float, total_root_depth: float,
                           coarse_fragments=0.0) -> np.ndarray:
    """Grass/fallow trapezoidal root profile, normalised to 1
    (getTrapezoidRoots, grapevine.cpp:1656-1690): linear decrease to zero at
    ``total_root_depth``, integrated per layer, skeleton-corrected."""
    depth = np.asarray(layer_depth, dtype=float)
    thick = np.asarray(layer_thickness, dtype=float)
    coarse = np.broadcast_to(np.asarray(coarse_fragments, float), depth.shape)
    upper = depth - thick * 0.5
    lower = depth + thick * 0.5
    m = -2.0 / total_root_depth ** 2
    q = 2.0 / total_root_depth
    x1 = np.maximum(start_root_depth, upper)
    x2 = np.minimum(total_root_depth, lower)
    y = (m * x1 + q) + (m * x2 + q)
    roots = np.where((upper > total_root_depth) | (lower < start_root_depth),
                     0.0, y * np.abs(x2 - x1) * 0.5 * (1.0 - coarse))
    s = roots.sum()
    return roots / s if s > 0 else roots


def layer_uptake_fractions(root_density, saw_stress):
    """Per-layer share of the vine transpiration demand: root density times
    the saw-tooth water-stress coefficient, renormalised.

    The reference runs the Wang-Leuning stomatal model per layer with
    alphaLeuning x stressCoefficientProfile[i] (grapevine.cpp:960-990) and
    sums transpirationInstantLayer; distributing the canopy demand by
    density x stress is the same first-order weighting without L duplicate
    kernel evaluations.
    """
    w = jnp.asarray(root_density) * jnp.asarray(saw_stress)
    s = jnp.sum(w, axis=0, keepdims=True)
    return jnp.where(s > 0, w / jnp.maximum(s, 1e-12), 0.0)


def saw_stress(fraction_transpirable, threshold: float = 0.4):
    """Saw-tooth water-stress coefficient per layer
    (getWaterStressSawFunction, grapevine.cpp:1548-1554): 1 above the
    cultivar threshold of the fraction of transpirable soil water, linear
    below."""
    ftsw = jnp.asarray(fraction_transpirable)
    return jnp.where(ftsw > threshold, 1.0, ftsw / threshold)
