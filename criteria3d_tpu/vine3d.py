"""VINE3D orchestration: the TPU analogue of Vine3DProject::modelDailyCycle.

Drives the vineyard variant of the hourly cycle (bin/VINE3D/modelCore.cpp:90-271
and vine3DProject.cpp):

1. hourly meteorological forcing + solar radiation + ET0 + leaf wetness
   (computeLeafWetnessMap, project/meteoMaps.cpp:274-297);
2. grapevine ecophysiology: Farquhar/Wang-Leuning photosynthesis on the
   sun/shade big leaf (the same Magnani kernel HYDRALL uses —
   grapevine.cpp:816-925), per-layer root water uptake with hydraulic
   redistribution, water-stress coefficient (grapevine.cpp:1039-1052);
3. field-book agronomic operations (fieldBookAction, grapevine.cpp:341-372):
   irrigation, trimming, leaf removal, cluster thinning, harvesting;
4. hourly irrigation assignment (assignIrrigation, modelCore.cpp:43-88:
   the booked quantity is a number of hours; irrigation runs in the last
   ``quantity`` hours of the day at the field's max rate);
5. disease models: downy mildew (hourly cohort model) and powdery mildew
   (daily), src/grapevine/downyMildew.cpp / powderyMildew.cpp;
6. daily PhenoVitis phenology + Bindi-Miglietta LAI growth + fruit biomass
   partition (computePhenology / getLAIVine, grapevine.cpp:1393-1700);
7. the shared coupled surface-subsurface water step (runWaterFluxes3DModel).

All per-cell reference loops are whole-map JAX expressions; the hourly
orchestration is host-side exactly as the reference's daily cycle is.
"""

from __future__ import annotations

import dataclasses
import datetime

import jax
import jax.numpy as jnp
import numpy as np

from criteria3d_tpu.constants import HOUR_SECONDS, ZEROCELSIUS
from criteria3d_tpu.core.grid import Grid
from criteria3d_tpu.core.state import SolverParameters, WaterState
from criteria3d_tpu.model import HourlyForcing, ModelConfig
from criteria3d_tpu.physics import crop as crop_mod
from criteria3d_tpu.physics import grapevine as gv
from criteria3d_tpu.physics import meteo as meteo_mod
from criteria3d_tpu.physics import radiation as rad_mod
from criteria3d_tpu.physics.downy_mildew import (DownyMildewInput,
                                                 DownyMildewState,
                                                 downy_mildew_step)
from criteria3d_tpu.physics.powdery_mildew import (PowderyMildewState,
                                                   powdery_mildew_step)
from criteria3d_tpu.solver.step import compute_period, initialize_balance

__all__ = ["FieldOperation", "FieldBookEntry", "Vine3DModel"]

# RH threshold of the dichotomic leaf-wetness rule
# (computeLeafWetness, agrolib/meteo/meteo.cpp:444-454)
LEAF_WETNESS_RH_THRESHOLD = 87.0


class FieldOperation:
    """TfieldOperation (grapevine.h)."""

    IRRIGATION = "irrigation"
    GRASS_SOWING = "grassSowing"
    GRASS_REMOVING = "grassRemoving"
    TRIMMING = "trimming"
    LEAF_REMOVAL = "leafRemoval"
    CLUSTER_THINNING = "clusterThinning"
    HARVESTING = "harvesting"
    TARTARIC_ANALYSIS = "tartaricAnalysis"


@dataclasses.dataclass(frozen=True)
class FieldBookEntry:
    """One agronomic operation booked on a field (TfieldBook,
    vine3DProject.h; loaded from the 'field_book' DB table)."""

    date: datetime.date
    field_index: int
    operation: str
    quantity: float = 0.0        # hours for irrigation, % for thinning, ...


@dataclasses.dataclass
class Vine3DModel:
    """Vineyard model state + hourly driver (Vine3DProject analogue).

    ``field_map`` assigns each DEM cell a field index (the reference's
    modelCase index map); field-book operations and irrigation apply to the
    matching cells only.
    """

    grid: Grid
    params: SolverParameters
    config: ModelConfig
    water: WaterState
    vine_params: gv.GrapevineParameters
    vine: gv.GrapevineState                  # (R,C) maps
    vine_crop: crop_mod.CropParameters       # root/uptake parameters (vine)
    grass_crop: crop_mod.CropParameters      # inter-row grass cover
    field_map: np.ndarray                    # (R,C) int field index, -1 = none
    field_book: list
    downy: DownyMildewState
    powdery: PowderyMildewState
    max_irrigation_rate: float = 2.0         # [mm h-1]
    grass_lai: float = 1.0
    training: gv.TrainingSystem | None = None
    # cultivar Wang-Leuning block from the fields DB (hydrall_* columns,
    # vine3DProject.cpp:252-261); None = defaults
    wang_leuning: object | None = None
    # cells where the model case is a vineyard (isVineyard,
    # vine3DProject.cpp:1410-1413); None = everywhere. Non-vineyard cells
    # keep the inter-row grass + bare-soil fluxes only.
    vineyard_mask: jax.Array | None = None
    # ini [settings] compute_diseases (VINE3D_test.ini; the reference app
    # gates computeDiseases in modelDailyCycle)
    compute_diseases: bool = True
    vine_root_density: jax.Array | None = None    # (L,) cardioid profile
    grass_root_density: jax.Array | None = None   # (L,) trapezoid profile
    water_stress_threshold: float = 0.4      # cultivar FTSW saw threshold
    harvested: jax.Array | None = None       # (R,C) bool
    stress: jax.Array | None = None          # (R,C) last stress coefficient
    # daily accumulators (reset by daily_update)
    _tsum: object = 0.0          # (R,C) per-cell daily accumulators
    _tmin: object = 1e9
    _tmax: object = -1e9
    _nhours: int = 0
    _rain_mm: jax.Array | None = None
    _wet_hours: jax.Array | None = None
    _rh_sum: jax.Array | None = None
    _assim_gm2: jax.Array | None = None      # daily net assimilation [g m-2]
    _irrigation_hours: dict | None = None    # field_index -> booked hours
    _t30_avg: float = 15.0                   # running ~30-day mean T [degC]

    @staticmethod
    def create(grid: Grid, params: SolverParameters, config: ModelConfig,
               *, matric_potential=-2.0,
               vine_params: gv.GrapevineParameters | None = None,
               field_map: np.ndarray | None = None,
               field_book: list | None = None,
               training: gv.TrainingSystem | None = None) -> "Vine3DModel":
        shape2d = grid.shape[1:]
        water = WaterState.initialize(grid, params,
                                      matric_potential=matric_potential)
        water = initialize_balance(grid, params, water)
        if field_map is None:
            field_map = np.where(np.asarray(grid.mask[0]), 0, -1)
        # vine roots: deep cardioid; grass: shallow
        vine_crop = crop_mod.CropParameters(
            root_depth_max=1.5, kc_max=1.1, f_raw=0.4)
        grass_crop = crop_mod.CropParameters(
            root_depth_max=0.3, kc_max=0.8, f_raw=0.5)

        # per-layer root profiles (setRootDensity CARDIOID /
        # setGrassRootDensity trapezoid, grapevine.cpp:1192-1290,1677-1690)
        L = grid.n_layers
        n_root = max(L - 2, 1)         # all soil layers below the first
        vine_roots = gv.vine_root_density(L, n_root,
                                          n_upper_layers_without_root=1)
        grass_roots = gv.trapezoid_root_density(
            np.asarray(grid.layer_depth), np.asarray(grid.layer_thickness),
            0.02, min(0.3, float(grid.layer_depth[-1])))

        vp = vine_params or gv.GrapevineParameters()
        if training is not None:
            # geometry from the training system (readFieldQuery,
            # vine3DProject.cpp:625-633)
            vp = dataclasses.replace(
                vp, shoots_per_plant=training.shoots_per_plant,
                plant_density=training.plant_density * 10000.0,
                shaded_surface=training.shaded_surface)

        return Vine3DModel(
            grid=grid, params=params, config=config, water=water,
            vine_params=vp,
            vine=gv.GrapevineState.initialize(shape2d),
            vine_crop=vine_crop, grass_crop=grass_crop,
            training=training,
            vine_root_density=jnp.asarray(vine_roots),
            grass_root_density=jnp.asarray(grass_roots),
            field_map=field_map, field_book=list(field_book or []),
            downy=DownyMildewState.initialize(shape2d),
            powdery=PowderyMildewState.initialize(shape2d),
            harvested=jnp.zeros(shape2d, bool),
            stress=jnp.zeros(shape2d),
            _rain_mm=jnp.zeros(shape2d), _wet_hours=jnp.zeros(shape2d),
            _rh_sum=jnp.zeros(shape2d), _assim_gm2=jnp.zeros(shape2d),
            _irrigation_hours={},
        )

    # ------------------------------------------------------------------
    def _field_mask(self, field_index: int) -> jax.Array:
        return jnp.asarray(self.field_map == field_index)

    def apply_field_book(self, date: datetime.date) -> None:
        """Apply the day's booked operations (checked at the first hour,
        modelCore.cpp:204-216; semantics fieldBookAction,
        grapevine.cpp:341-372)."""
        p = self.vine_params
        self._irrigation_hours = {}
        for entry in self.field_book:
            if entry.date != date:
                continue
            m = self._field_mask(entry.field_index)
            v = self.vine
            if entry.operation in (FieldOperation.TRIMMING,
                                   FieldOperation.LEAF_REMOVAL):
                n = jnp.where(m, jnp.maximum(
                    v.shoot_leaf_number - entry.quantity,
                    p.min_shoot_leaf_nr), v.shoot_leaf_number)
                shoot_area = p.leaf_d * n ** p.leaf_f
                lai = shoot_area * p.shoots_per_plant * p.plant_density \
                    / p.shaded_surface
                self.vine = dataclasses.replace(
                    v, shoot_leaf_number=n,
                    lai=jnp.where(m, jnp.clip(lai, p.lai_min, p.lai_max),
                                  v.lai))
            elif entry.operation == FieldOperation.CLUSTER_THINNING:
                f = 0.01 * (100.0 - entry.quantity)
                self.vine = dataclasses.replace(
                    v, fruit_biomass=jnp.where(m, v.fruit_biomass * f,
                                               v.fruit_biomass))
            elif entry.operation == FieldOperation.HARVESTING:
                self.harvested = self.harvested | m
            elif entry.operation == FieldOperation.IRRIGATION:
                self._irrigation_hours[entry.field_index] = entry.quantity

    def hourly_irrigation(self, hour: int) -> jax.Array:
        """Irrigation map [mm h-1]: booked fields irrigate in the last
        ``quantity`` hours of the day (assignIrrigation, modelCore.cpp:43-88)."""
        irr = jnp.zeros(self.grid.shape[1:])
        for field_index, nr_hours in (self._irrigation_hours or {}).items():
            if hour >= 24 - nr_hours:
                irr = jnp.where(self._field_mask(field_index),
                                self.max_irrigation_rate, irr)
        return irr

    # ------------------------------------------------------------------
    def _grapevine_fluxes(self, forcing: HourlyForcing, rad, saw_profile,
                          year: int, doy: int) -> dict:
        """Whole-map photosynthesis + stomatal transpiration through the
        VINE-SPECIFIC sun/shade stack (photosynthesisAndTranspiration,
        grapevine.cpp:385-396), not the hydrall forest kernel: the
        simplified Pa-unit fixed-point kernel is re-solved per root layer
        with STOMWL = alpha x sawStress[layer] and root-density weighted
        (carbonWaterFluxesProfile, grapevine.cpp:953-993; parity vs the
        compiled reference in tests/test_grapevine_parity.py)."""
        from criteria3d_tpu.physics import vine_photosynthesis as vp

        cfg = self.config
        dem2d = self.grid.z[0]
        lai = jnp.where(self.harvested, self.vine_params.lai_min,
                        self.vine.lai)
        t_air = jnp.asarray(forcing.air_temperature, jnp.float64)
        rh = jnp.clip(jnp.asarray(forcing.rel_humidity, jnp.float64),
                      1.0, 100.0)
        pressure = meteo_mod.pressure_from_altitude(dem2d)            # [Pa]
        # cloudIndex from the transmissivity ratio (the reference derives
        # it from observed/potential radiation, vine3DProject meteoMaps)
        cloud = jnp.clip(1.0 - jnp.asarray(forcing.transmissivity,
                                           jnp.float64)
                         / cfg.clear_sky_transmissivity, 0.0, 1.0)

        out = vp.vine_canopy_fluxes(
            lai=lai, sun_elevation_deg=rad.sun["elevation_refr"],
            direct_irr=rad.beam, diffuse_irr=rad.diffuse,
            cloudiness=cloud, t_air_c=t_air, rh_pct=rh,
            wind_speed=jnp.asarray(forcing.wind_speed, jnp.float64),
            pressure_pa=pressure, mean_month_t_c=self._t30_avg,
            stress_profile=saw_profile,
            root_density=self.vine_root_density[:, None, None],
            year=year, doy=doy,
            params=self.wang_leuning or vp.WangLeuningParameters(
                water_stress_threshold=self.water_stress_threshold),
            stage=self.vine.stage)

        respiration = vp.plant_respiration(
            cumulated_biomass=self.vine.cumulated_biomass / 1000.0,  # [kg]
            fruit_biomass=self.vine.fruit_biomass / 1000.0,
            days_after_bloom=self.vine.days_after_bloom,
            t_air_c=t_air, mean_month_t_c=self._t30_avg,
            psi_soil_avg=-100.0, psi_fc_avg=-33.0, wilting_point=-1500.0)
        # net assimilation, mol CO2 m-2 h-1 -> g DM m-2 h-1
        # (cumulatedResults, grapevine.cpp:1057-1078: x12 g/mol, /CARBONFACTOR)
        assim_g = ((out["assimilation"] - respiration) * 3600.0
                   * 12.0 / vp.CARBON_FACTOR)
        # per-layer transpiration mol m-2 s-1 -> mm h-1: x3600 s, x0.018
        # kg mol-1 gives kg m-2 == mm (cumulatedResults, grapevine.cpp:1073)
        transp_layer_mm = (3600.0 * vp.H2O_MOLECULAR_WEIGHT
                           * out["transpiration_layer"])
        return dict(assimilation_g=assim_g,
                    transpiration_layer_mm=transp_layer_mm,
                    transpiration_mm=jnp.sum(transp_layer_mm, axis=0),
                    stress_coefficient=out["stress_coefficient"],
                    lai=lai)

    # ------------------------------------------------------------------
    def _layer_uptake(self, demand_mm, root_density, saw, theta, theta_wp):
        """(sink [m3 s-1] (L,R,C), actual [mm] (R,C)): distribute the canopy
        transpiration demand over layers by root density x saw stress,
        bounded by the extractable water per layer."""
        grid = self.grid
        frac = gv.layer_uptake_fractions(root_density[:, None, None], saw)
        layer_t = demand_mm[None] * frac                       # [mm]
        # bound: water above wilting point in the layer, per hour
        thick = jnp.asarray(grid.layer_thickness)[:, None, None]
        avail_mm = jnp.maximum(theta - theta_wp, 0.0) * thick * 1000.0
        layer_t = jnp.minimum(layer_t, avail_mm)
        layer_t = jnp.where(grid.mask, layer_t, 0.0).at[0].set(0.0)
        sink = -grid.area * (layer_t / 1000.0) / HOUR_SECONDS
        return sink, jnp.sum(layer_t, axis=0)

    # ------------------------------------------------------------------
    def run_hour(self, forcing: HourlyForcing, year: int, month: int,
                 day: int, hour: int) -> dict:
        """One hour of the vineyard cycle (modelDailyCycle body)."""
        grid, params, cfg = self.grid, self.params, self.config
        date = datetime.date(year, month, day)
        valid = grid.mask[0]
        dem2d = grid.z[0]
        out = {}

        if hour == 1:
            self.apply_field_book(date)

        # ---- radiation + ET0 + leaf wetness
        lat = jnp.full(dem2d.shape, cfg.latitude)
        lon = jnp.full(dem2d.shape, cfg.longitude)
        rad = rad_mod.compute_radiation_dem(
            dem2d, valid, grid.cell_size, lat, lon,
            jnp.zeros_like(dem2d), jnp.zeros_like(dem2d),
            cfg.timezone, year, month, day, hour,
            linke=cfg.linke, albedo=cfg.albedo,
            clear_sky_transmissivity=cfg.clear_sky_transmissivity,
            transmissivity=jnp.broadcast_to(
                jnp.asarray(forcing.transmissivity, jnp.float64),
                dem2d.shape))
        norm_trans = jnp.asarray(forcing.transmissivity, jnp.float64) \
            / cfg.clear_sky_transmissivity
        et0 = meteo_mod.et0_penman_hourly(
            dem2d, norm_trans, rad.global_irr, forcing.air_temperature,
            forcing.rel_humidity, forcing.wind_speed)
        et0 = jnp.where(valid, et0, 0.0)
        leaf_wetness = ((forcing.precipitation > 0)
                        | (forcing.rel_humidity > LEAF_WETNESS_RH_THRESHOLD)
                        ).astype(jnp.float32)
        out["et0"] = et0
        out["leaf_wetness"] = leaf_wetness

        # ---- soil-moisture stress profile (initializeWaterStress,
        # grapevine.cpp:182-187: saw-tooth on the fraction of transpirable
        # soil water, computed BEFORE photosynthesis)
        from criteria3d_tpu.core.soil import theta_from_se
        from criteria3d_tpu.solver import water as W
        se = W.compute_se(grid, params, self.water.h)
        theta = jnp.where(grid.mask, theta_from_se(grid.soil, se), 0.0)
        theta_sat, theta_fc, theta_wp, _ = crop_mod.water_content_thresholds(
            grid, params)
        ftsw = jnp.clip((theta - theta_wp)
                        / jnp.maximum(theta_fc - theta_wp, 1e-9), 0.0, 1.0)
        saw = gv.saw_stress(ftsw, self.water_stress_threshold)
        saw = jnp.where(grid.mask, saw, 0.0)

        # ---- grapevine photosynthesis / per-layer stomatal transpiration
        doy = date.timetuple().tm_yday
        fluxes = self._grapevine_fluxes(forcing, rad, saw, year, doy)
        vy = valid if self.vineyard_mask is None \
            else (valid & self.vineyard_mask)
        self._assim_gm2 = self._assim_gm2 + jnp.where(
            vy, fluxes["assimilation_g"], 0.0)
        out["vine_transpiration_demand"] = fluxes["transpiration_mm"]

        # vine: the kernel's per-layer transpiration IS the extraction
        # (modelCore.cpp:220-226 getExtractedWater -> waterSinkSource),
        # capped at the extractable water per layer for robustness
        thick = jnp.asarray(grid.layer_thickness)[:, None, None]
        avail_mm = jnp.maximum(theta - theta_wp, 0.0) * thick * 1000.0
        layer_v = jnp.minimum(fluxes["transpiration_layer_mm"], avail_mm)
        layer_v = jnp.where(grid.mask, layer_v, 0.0).at[0].set(0.0)
        if self.vineyard_mask is not None:
            # grapevine runs only on vineyard model cases
            # (modelDailyCycle gates on isVineyard, modelCore.cpp:219)
            layer_v = jnp.where(self.vineyard_mask[None], layer_v, 0.0)
        sink_v = -grid.area * (layer_v / 1000.0) / HOUR_SECONDS
        act_v = jnp.sum(layer_v, axis=0)

        # inter-row grass: shallow trapezoid roots, ET0-driven
        pot_grass = crop_mod.potential_transpiration(
            et0, jnp.full(dem2d.shape, self.grass_lai),
            self.grass_crop.kc_max)
        sink_g, act_g = self._layer_uptake(
            pot_grass, self.grass_root_density, saw, theta, theta_wp)
        # stomatal stress coefficient 1 - Gs/Gs_nostress
        # (getStressCoefficient, grapevine.cpp:1043-1055)
        self.stress = fluxes["stress_coefficient"]
        out["vine_stress"] = self.stress
        out["vine_transpiration"] = act_v
        out["grass_transpiration"] = act_g

        # ---- evaporation from bare soil fraction
        surf_water = self.water.surface_water_level(grid)
        sink_e, evap_mm = crop_mod.evaporation_sink(
            grid, params, theta, surf_water, et0, fluxes["lai"])

        # ---- precipitation + irrigation -> surface
        irr_mm = self.hourly_irrigation(hour)
        water_in_mm = forcing.precipitation + irr_mm
        prec_flow = grid.area * (water_in_mm / 1000.0) / HOUR_SECONDS
        sink = sink_v + sink_g + sink_e
        sink = sink.at[0].add(jnp.where(valid, prec_flow, 0.0))
        out["irrigation"] = irr_mm

        # ---- hourly downy mildew (computeDiseases; downyMildew.cpp)
        if self.compute_diseases:
            self.downy, dm_out = downy_mildew_step(
                self.downy, DownyMildewInput(
                    tair=forcing.air_temperature,
                    rain=forcing.precipitation,
                    leaf_wetness=leaf_wetness,
                    relative_humidity=forcing.rel_humidity),
                is_first_january=(month == 1 and day == 1 and hour == 0))
            out["downy_mildew_infection"] = dm_out["is_infection"]

        # ---- daily accumulators: per-cell temperature MAPS (the reference
        # VINE3D drives phenology from the hourly temperature maps per
        # cell, modelCore.cpp; a catchment-mean scalar would flatten
        # phenology across relief)
        t_map = jnp.where(valid, forcing.air_temperature, 0.0)
        self._tsum = self._tsum + t_map
        self._tmin = jnp.minimum(self._tmin, t_map)
        self._tmax = jnp.maximum(self._tmax, t_map)
        self._nhours += 1
        self._rain_mm = self._rain_mm + forcing.precipitation
        self._wet_hours = self._wet_hours + leaf_wetness
        self._rh_sum = self._rh_sum + forcing.rel_humidity

        # ---- 3D soil water fluxes (shared solver)
        self.water = dataclasses.replace(self.water, sink_source=sink)
        self.water = compute_period(grid, params, self.water, HOUR_SECONDS)
        out["mbr"] = float(self.water.balance_whole.mbr)
        return out

    # ------------------------------------------------------------------
    def daily_update(self, date: datetime.date) -> dict:
        """End-of-day: phenology, LAI growth, fruit biomass, powdery mildew."""
        p = self.vine_params
        n = max(self._nhours, 1)
        tavg = self._tsum / n            # (R,C) per-cell daily mean
        # exponential running mean with ~30-day e-folding (Kattge-Knorr
        # acclimation input of farquhar_parameters)
        self._t30_avg += (tavg - self._t30_avg) / 30.0
        doy = date.timetuple().tm_yday

        # thermal-sum bookkeeping BEFORE phenology (updateThermalSum,
        # bin/VINE3D/plant.cpp:378-420), then the PhenoVitis step
        after_march = (date.month, date.day) >= (3, 1)
        self.vine = gv.update_thermal_sum(self.vine, tavg, after_march)
        self.vine = gv.phenology_daily_step(self.vine, p, tavg, doy)
        self.vine = gv.lai_vine_daily(
            self.vine, p, tavg, doy,
            stress_coefficient=jnp.maximum(1.0 - self.stress, 0.0))
        self.vine = gv.fruit_biomass_step(self.vine, p, self._assim_gm2)

        from criteria3d_tpu.model import masked_mean
        out = dict(tavg=tavg,
                   tavg_mean=masked_mean(tavg, self.grid.mask[0]),
                   stage=self.vine.stage,
                   lai=self.vine.lai,
                   fruit_biomass=self.vine.fruit_biomass,
                   tartaric_acid=gv.tartaric_acid(self.vine))
        if self.compute_diseases:
            bud_break = bool(jnp.any(
                (self.vine.stage >= gv.Stage.BUD_BURST)
                & (self.vine.stage < gv.Stage.BUD_BURST + 0.05)))
            self.powdery, pm_out = powdery_mildew_step(
                self.powdery, tavg=tavg, rain=self._rain_mm,
                leaf_wetness=jnp.minimum(self._wet_hours, 24.0),
                relative_humidity=self._rh_sum / n,
                is_bud_break=bud_break)
            out["powdery_infection_risk"] = pm_out["infection_risk"]
        # reset accumulators
        shape2d = self.grid.shape[1:]
        self._tsum, self._tmin, self._tmax, self._nhours = 0.0, 1e9, -1e9, 0
        self._rain_mm = jnp.zeros(shape2d)
        self._wet_hours = jnp.zeros(shape2d)
        self._rh_sum = jnp.zeros(shape2d)
        self._assim_gm2 = jnp.zeros(shape2d)
        return out

    # ------------------------------------------------------------------
    def run_period(self, first_day: datetime.date, n_days: int,
                   forcing_provider) -> list:
        """Multi-day driver (Vine3DProject::runModels / modelDailyCycle)."""
        daily_log = []
        for d in range(n_days):
            date = first_day + datetime.timedelta(days=d)
            for hour in range(24):
                forcing = forcing_provider(date, hour)
                out = self.run_hour(forcing, date.year, date.month, date.day,
                                    hour)
            day_out = self.daily_update(date)
            daily_log.append(dict(date=str(date), mbr=out["mbr"],
                                  tavg=day_out["tavg_mean"]))
        return daily_log
