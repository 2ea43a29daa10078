"""HYDRALL forest carbon & water model (Magnani, UNIBO) — core processes.

Vectorised re-implementation of src/hydrall/hydrall.cpp:

* sun/shade big-leaf radiation absorption (Wang & Leuning 1998;
  radiationAbsorption, hydrall.cpp:712-841) with Goudriaan diffuse
  extinction and Agusti leaf absorbance;
* leaf temperature (Stanghellini 1987; leafTemperature, hydrall.cpp:863-884);
* Farquhar parameter upscaling with Kattge-Knorr acclimation
  (upscale, hydrall.cpp:1153-1247);
* coupled assimilation / stomatal conductance / transpiration fixed point
  (photosynthesisKernel, hydrall.cpp:1306-1394) as a damped fixed-point
  iteration vectorised over big-leaf maps;
* plant respiration (plantRespiration, hydrall.cpp:1542-1600,
  Lloyd & Taylor temperature response);
* simplified annual carbon allocation (simplifiedGrowthStand,
  hydrall.cpp:1694-1800): turnover, root/shoot allocation, NPP increment.

The reference's per-cell driver loop becomes whole-map element-wise math;
aerodynamic coupling currently uses a constant boundary-layer conductance
(the reference's full Monin-Obukhov leaf coupling is pending).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from criteria3d_tpu.constants import R_GAS, STEFAN_BOLTZMANN, ZEROCELSIUS

__all__ = ["HydrallPlantState", "big_leaf_radiation", "leaf_temperature",
           "farquhar_parameters", "photosynthesis_kernel",
           "plant_respiration", "annual_growth"]

# hydrall.h:43-57 — Farquhar/Arrhenius parameters [kJ mol-1] and scale factors
HARD, HAVCM, HAJM = 46.39, 65.33, 43.9
HAKC, HAKO, HAGSTAR = 79.43, 36.38, 37.83
HDEACTIVATION = 200.0
CRD, CVCM, CGSTAR, CKC, CKO, CJM = 18.72, 26.35, 19.02, 38.05, 20.30, 17.7
RESPIRATION_PARAMETER = 1.47222e-6      # hydrall.h:33
OSS = 21176.0                           # O2 partial pressure [Pa]
HEAT_CAPACITY_AIR_MOLAR = 29.31
CARBON_FACTOR = 0.5                     # kg C per kg DM


def upscaling_func(k, lai):
    """(1 - exp(-k·LAI))/k (hydrall.h:14)."""
    k = jnp.maximum(k, 1e-9)
    return (1.0 - jnp.exp(-k * lai)) / k


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HydrallPlantState:
    """Tree carbon pools [kg DM m-2] + annual accumulators."""

    biomass_foliage: jax.Array
    biomass_sapwood: jax.Array
    biomass_root: jax.Array
    npp_year: jax.Array         # [kg C m-2] net primary production, running

    @staticmethod
    def initialize(shape=(), foliage=0.2, sapwood=6.0, root=0.4,
                   dtype=jnp.float64) -> "HydrallPlantState":
        f = lambda v: jnp.full(shape, v, dtype)
        return HydrallPlantState(biomass_foliage=f(foliage),
                                 biomass_sapwood=f(sapwood),
                                 biomass_root=f(root), npp_year=f(0.0))


def big_leaf_radiation(lai, sine_solar_elevation, direct_irradiance,
                       diffuse_irradiance, air_temp_c, longwave_irradiance,
                       *, chlorophyll=500.0, clumping=1.0):
    """Sun/shade absorbed PAR [mol m-2 s-1] and isothermal net radiation.

    Mirrors radiationAbsorption (hydrall.cpp:712-841). Returns a dict with
    sunlit/shaded LAI, absorbed PAR and net radiation, plus the extinction
    coefficients needed by :func:`farquhar_parameters`.
    """
    sin_b = jnp.maximum(jnp.asarray(sine_solar_elevation), 1e-6)
    lai = jnp.maximum(jnp.asarray(lai), 1e-6)

    kb = jnp.minimum(50.0, 0.5 / sin_b) * clumping
    kd = (-1.0 / lai) * jnp.log(0.178 * jnp.exp(-0.5 * lai)
                                + 0.514 * jnp.exp(-0.5 * lai)
                                + 0.308 * jnp.exp(-0.5 * lai)) * clumping

    # leaf absorbance from chlorophyll (Agusti et al. 1994)
    exponent = -(10.0 ** (0.28 + 0.63 * jnp.log10(chlorophyll * 0.85 / 1000.0)))
    absorb_par = 1.0 - 10.0 ** exponent
    scat_par = 1.0 - absorb_par
    scat_nir = 0.8                      # leafAbsorbanceNIR = 0.2

    kd_par = kd * jnp.sqrt(1 - scat_par)
    kd_nir = kd * jnp.sqrt(1 - scat_nir)
    kb_par = kb * jnp.sqrt(1 - scat_par)
    kb_nir = kb * jnp.sqrt(1 - scat_nir)

    rho_h_par = (1 - jnp.sqrt(1 - scat_par)) / (1 + jnp.sqrt(1 - scat_par))
    rho_h_nir = (1 - jnp.sqrt(1 - scat_nir)) / (1 + jnp.sqrt(1 - scat_nir))
    beam_frac = 2.0 * kb / (kb + kd)
    rho_b_par = beam_frac * rho_h_par
    rho_b_nir = beam_frac * rho_h_nir

    i_dir = jnp.asarray(direct_irradiance) * 0.5       # PAR = NIR = 0.5 I
    i_dif = jnp.asarray(diffuse_irradiance) * 0.5

    day = sin_b > 1e-3
    lai_sun = jnp.where(day, upscaling_func(kb, lai), 0.0)
    lai_shade = lai - lai_sun

    d5 = i_dif * (1 - rho_h_par) * kd_par
    d6 = i_dir * (1 - rho_b_par) * kb_par
    d7 = i_dir * (1 - scat_par) * kb
    d8 = i_dif * (1 - rho_h_nir) * kd_nir
    d9 = i_dir * (1 - rho_b_nir) * kb_nir
    d10 = i_dir * (1 - scat_nir) * kb
    d11 = upscaling_func(kd_par + kb, lai)
    d12 = upscaling_func(kb_par + kb, lai)
    d13 = d11
    d14 = upscaling_func(kb_nir + kb, lai)
    d15 = upscaling_func(kb, lai) - upscaling_func(2.0 * kb, lai)
    d16 = (jnp.asarray(longwave_irradiance)
           - STEFAN_BOLTZMANN * (air_temp_c + ZEROCELSIUS) ** 4) * kd

    par_sun = d5 * d11 + d6 * d12 + d7 * d15
    par_shade = (d5 * (upscaling_func(kd_par, lai) - d11)
                 + d6 * (upscaling_func(kb_par, lai) - d12) - d7 * d15)
    nir_sun = d8 * d13 + d9 * d14 + d10 * d15
    nir_shade = (d8 * (upscaling_func(kd_nir, lai) - d13)
                 + d9 * (upscaling_func(kb_nir, lai) - d14) - d10 * d15)

    em_leaf, em_soil = 0.96, 0.94
    lw_sun = d16 * upscaling_func(kb + kd, lai) * em_leaf
    lw_shade = d16 * upscaling_func(kd, lai) - lw_sun

    rni_sun = jnp.where(day, par_sun + nir_sun + lw_sun, 0.0)
    rni_shade = par_shade * day + nir_shade * day + lw_shade

    return dict(
        lai_sunlit=lai_sun, lai_shaded=lai_shade,
        par_sunlit=jnp.where(day, par_sun, 0.0) * 4.57e-6,
        par_shaded=jnp.where(day, par_shade, 0.0) * 4.57e-6,
        rni_sunlit=rni_sun, rni_shaded=rni_shade,
        kb=kb, kd=kd, kd_par=kd_par)


def leaf_temperature(air_temp_c, direct_irradiance, diffuse_irradiance, vpd_pa,
                     psychro_pa, sine_solar_elevation):
    """(T_sunlit, T_shaded) [K] — Stanghellini 1987 (hydrall.cpp:863-884)."""
    day = jnp.asarray(sine_solar_elevation) > 1e-3
    shaded_rad = jnp.asarray(diffuse_irradiance) * 3600.0
    sunlit_rad = (jnp.asarray(diffuse_irradiance)
                  + jnp.asarray(direct_irradiance)) * 3600.0
    corr = -0.25 * vpd_pa / psychro_pa
    t_shade = jnp.where(day, air_temp_c + 1.67e-6 * shaded_rad + corr,
                        air_temp_c)
    t_sun = jnp.where(day, air_temp_c + 1.67e-6 * sunlit_rad + corr,
                      air_temp_c)
    return t_sun + ZEROCELSIUS, t_shade + ZEROCELSIUS


def _acclimation(ha, hd, leaf_t, entropic, opt_t):
    """Kattge & Knorr 2007 peaked Arrhenius (hydrall.cpp:1249-1256)."""
    return (jnp.exp(ha * (leaf_t - opt_t) / (opt_t * R_GAS * leaf_t))
            * (1 + jnp.exp((opt_t * entropic - hd) / (opt_t * R_GAS)))
            / (1 + jnp.exp((leaf_t * entropic - hd) / (leaf_t * R_GAS))))


def farquhar_parameters(leaf_t_k, absorbed_par, lai, kb, kd_par,
                        pressure_pa, last30_t_avg, *,
                        max_carbox_rate=150.0, opt_temp_k=298.15,
                        gs_min=0.02, chlorophyll=500.0, sunlit=True):
    """Big-leaf Farquhar parameters (upscale, hydrall.cpp:1153-1247).

    Returns dict: vcmax, jmax (PAR-adjusted), kc, ko, gamma_star (Pa),
    rd, gsc_min — all scaled to the sunlit or shaded big leaf.
    """
    rt = R_GAS / 1000.0 * leaf_t_k        # [kJ mol-1]
    t_c = leaf_t_k - ZEROCELSIUS

    if sunlit:
        scale = upscaling_func(kb + kd_par, lai)
    else:
        scale = upscaling_func(kd_par, lai) - upscaling_func(kb + kd_par, lai)
    scale = jnp.maximum(scale, 0.0)

    vcmax_opt = max_carbox_rate * 1e-6
    rd0 = 0.0089 * vcmax_opt
    rd = rd0 * jnp.exp(CRD - HARD / rt) * scale

    s_j = -0.75 * last30_t_avg + 660.0
    s_v = -1.07 * last30_t_avg + 668.0
    vcmax = vcmax_opt * _acclimation(HAVCM * 1000, HDEACTIVATION * 1000,
                                     leaf_t_k, s_v, opt_temp_k) * scale
    jmax = 1.5 * vcmax_opt * _acclimation(HAJM * 1000, HDEACTIVATION * 1000,
                                          leaf_t_k, s_j, opt_temp_k) * scale

    kc = jnp.exp(CKC - HAKC / rt) * 1e-6 * pressure_pa
    ko = jnp.exp(CKO - HAKO / rt) * 1e-3 * pressure_pa
    gamma_star = jnp.exp(CGSTAR - HAGSTAR / rt) * 1e-6 * pressure_pa

    # PAR limitation via the non-rectangular hyperbola (hydrall.cpp:1222-1240)
    quantum_yield = 0.352 + 0.022 * t_c - 3.4e-4 * t_c ** 2
    convexity = (1 - chlorophyll * 6.93e-4) / 0.98 \
        * (0.76 + 0.018 * t_c - 3.7e-4 * t_c ** 2)
    pot = absorbed_par * quantum_yield * 0.5
    s = pot + jmax
    p = pot * jmax
    disc = jnp.maximum(s ** 2 - 4.0 * convexity * p, 0.0)
    j = (s - jnp.sqrt(disc)) / (2.0 * jnp.maximum(convexity, 1e-6))

    return dict(vcmax=vcmax, j=j, kc=kc, ko=ko, gamma_star=gamma_star,
                rd=rd, gsc_min=gs_min * scale)


@functools.partial(jax.jit, static_argnames=("max_iter", "tol"))
def photosynthesis_kernel(params, *, co2_pa, vpd_pa, pressure_pa, air_temp_c,
                          rni, slope_sat_vp, psychro_pa,
                          gac=0.5, ghr=0.5, stress=1.0, mi=9.31,
                          max_iter=10000, tol=1e-7):
    """Coupled assimilation / stomatal conductance / transpiration.

    The damped fixed-point iteration of photosynthesisKernel
    (hydrall.cpp:1306-1394) with the reference's EXACT semantics:
    damping 0.01 on the stromal CO2 update, per-cell stopping at
    |dASS| <= 1e-7 (cells freeze at their own stopping iterate — with
    this damping the reference stops at a damping-dependent
    pseudo-converged point, so matching requires the same trajectory),
    and the dark-respiration rescaling RD *= clip(ASS/ASSOLD, 0.1, 10).
    Parity vs the compiled reference kernel:
    tests/test_hydrall_parity.py.  Returns (assimilation
    [mol CO2 m-2 s-1], gsc, transpiration [mol H2O m-2 s-1]).
    """
    j = params["j"]
    vcmax = params["vcmax"]
    kc, ko = params["kc"], params["ko"]
    comp = params["gamma_star"]
    gscd = params["gsc_min"]
    rd0 = params["rd"]
    stomwl = mi * stress

    rh_factor = 613.75 * jnp.exp(17.502 * air_temp_c / (240.97 + air_temp_c))
    dum1 = 1.6 * slope_sat_vp / psychro_pa + ghr / gac
    damping = 0.01

    def step(ci, vpds, rd):
        rh = 1.0 - vpds / rh_factor
        wc = vcmax * ci / (ci + kc * (1.0 + OSS / ko))
        wj = j * ci / (4.5 * ci + 10.5 * comp)
        vc = jnp.minimum(wc, wj)
        ass = jnp.maximum(1e-8, vc * (1.0 - comp / jnp.maximum(ci, 1e-4)))
        cs = co2_pa - pressure_pa * (ass - rd) / gac
        cs = jnp.maximum(cs, 1e-4)
        cs_mol = jnp.maximum(cs / pressure_pa * 1e6, 1e-3)
        comp_mol = comp / pressure_pa * 1e6
        # stomatal conductance (hydrall.cpp:1359 — the ACTIVE line:
        # GSCD + STOMWL*(ASS-RD)*1e6/(CSmol-COMPmol)*RH; the commented
        # temp2 variant with an extra /pressure is dead code upstream and
        # had previously been ported here, collapsing gsc to ~gscd)
        gsc = gscd + stomwl * (ass - rd) * 1e6 / jnp.maximum(
            cs_mol - comp_mol, 1e-3) * rh
        gsc = jnp.maximum(gsc, 1e-5)
        ci_new = cs - pressure_pa * (ass - rd) / gsc
        ci_new = jnp.clip(ci_new, 0.01, co2_pa)
        ci_new = damping * ci_new + (1.0 - damping) * ci
        ci_new = jnp.clip(ci_new, 0.01, co2_pa)
        vpds_new = (slope_sat_vp / HEAT_CAPACITY_AIR_MOLAR * rni
                    + vpd_pa * ghr) / (ghr + gsc * dum1)
        return ci_new, vpds_new, ass, gsc

    shape = jnp.broadcast_shapes(*(jnp.shape(x) for x in
                                   (j, vcmax, rd0, stomwl, vpd_pa)))
    ci0 = jnp.broadcast_to(0.7 * co2_pa, shape) + jnp.zeros(shape)
    vpds0 = jnp.broadcast_to(vpd_pa, shape) + jnp.zeros(shape)
    rd_a = jnp.broadcast_to(rd0, shape) + jnp.zeros(shape)

    def cond(c):
        it, _, _, _, _, _, done = c
        return (it < max_iter) & ~jnp.all(done)

    def body(c):
        it, ci, vpds, rd, ass_old, out, done = c
        ci2, vpds2, ass, gsc = step(ci, vpds, rd)
        ratio = jnp.clip(ass / jnp.maximum(ass_old, 1e-300), 0.1, 10.0)
        rd2 = jnp.where(it > 0, rd * ratio, rd)
        newly_done = (it > 0) & (jnp.abs(ass - ass_old) <= tol)
        keep = done
        ci2 = jnp.where(keep, ci, ci2)
        vpds2 = jnp.where(keep, vpds, vpds2)
        rd2 = jnp.where(keep, rd, rd2)
        out = (jnp.where(keep, out[0], ass), jnp.where(keep, out[1], gsc),
               jnp.where(keep, out[2], vpds2))
        ass_new = jnp.where(keep, ass_old, ass)
        return (it + 1, ci2, vpds2, rd2, ass_new, out, done | newly_done)

    zero = jnp.zeros(shape)
    _, _, _, _, _, (ass, gsc, vpds), _ = jax.lax.while_loop(
        cond, body,
        (0, ci0, vpds0, rd_a, zero, (zero, zero, vpds0),
         jnp.zeros(shape, bool)))

    night = j < 1e-7
    ass = jnp.where(night, 0.0, ass)
    gsc = jnp.where(night, gscd + zero, gsc)
    vpds = jnp.where(night, vpd_pa + zero, vpds)
    tr = jnp.maximum(1e-8, (gsc / 0.64) * vpds / pressure_pa)
    return ass, gsc, tr


def plant_respiration(state: HydrallPlantState, air_temp_c, moisture_factor,
                      opt_temp_k=298.15):
    """Whole-plant maintenance respiration [mol CO2 m-2 s-1]
    (plantRespiration, hydrall.cpp:1542-1600)."""
    n_leaf, n_root, n_stem = 0.02, 0.0078, 0.0021
    leaf = RESPIRATION_PARAMETER * state.biomass_foliage * n_leaf / 0.014
    sap = RESPIRATION_PARAMETER * state.biomass_sapwood * n_stem / 0.014
    root = RESPIRATION_PARAMETER * state.biomass_root * n_root / 0.014

    t_k = air_temp_c + ZEROCELSIUS
    # Lloyd & Taylor 1994 (temperatureFunction, hydrall.cpp:1636-1648)
    t_factor = jnp.exp(308.56 * (1.0 / (opt_temp_k + 46.02)
                                 - 1.0 / (t_k + 46.02)))
    f = jnp.clip(t_factor * moisture_factor, 0.0, 1.0)
    return (leaf + sap + root) * f


def annual_growth(state: HydrallPlantState, *, yearly_prec, yearly_et0,
                  foliage_longevity=4.0, sapwood_longevity=30.0,
                  root_longevity=1.5, root_shoot_ratio_ref=0.25):
    """Annual turnover + allocation of NPP (simplifiedGrowthStand,
    hydrall.cpp:1694-1800; management/wildfire options omitted).

    Returns (new_state, litter_carbon) — litter feeds RothC.
    """
    litter = (state.biomass_foliage / foliage_longevity
              + state.biomass_sapwood / sapwood_longevity
              + state.biomass_root / root_longevity) * CARBON_FACTOR

    foliage = state.biomass_foliage * (1 - 1 / foliage_longevity)
    sapwood = state.biomass_sapwood * (1 - 1 / sapwood_longevity)
    root = state.biomass_root * (1 - 1 / root_longevity)

    growth = state.npp_year / CARBON_FACTOR    # [kg DM m-2]

    alpha = 0.7
    aridity = 1.0 - yearly_prec / jnp.maximum(yearly_et0, 1e-6)
    rs = jnp.clip(root_shoot_ratio_ref * (alpha * aridity + 1.0),
                  root_shoot_ratio_ref, root_shoot_ratio_ref * (alpha * 0.5 + 1))
    to_root = rs / (1 + rs)
    to_foliage = (1 - to_root) * 0.05
    to_sapwood = 1 - to_root - to_foliage

    new = HydrallPlantState(
        biomass_foliage=jnp.maximum(foliage + growth * to_foliage, 1e-5),
        biomass_sapwood=jnp.maximum(sapwood + growth * to_sapwood, 1e-5),
        biomass_root=jnp.maximum(root + growth * to_root, 1e-5),
        npp_year=jnp.zeros_like(state.npp_year))
    return new, litter


# ----------------------------------------------------------------------
# whole-map hourly/daily/annual driver (Crit3DProject::computeHydrallModel
# / dailyUpdateHydrall, bin/CRITERIA3D/criteria3DProject.cpp:634-700,
# 1238-1239, 1827-1915)
# ----------------------------------------------------------------------

# atmospheric CO2 scenario table (getCO2, hydrall.cpp): [year] -> [ppm]
_CO2_YEARS = np.array([1750, 1800, 1850, 1900, 1910, 1920, 1930, 1940, 1950,
                       1960, 1970, 1980, 1990, 2000, 2010, 2020, 2030, 2040,
                       2050, 2060, 2070, 2080, 2090, 2100], dtype=float)
_CO2_PPM = np.array([278, 283, 285, 296, 300, 303, 307, 310, 311, 317, 325,
                     339, 354, 369, 389, 413, 443, 473, 503, 530, 550, 565,
                     570, 575], dtype=float)


def atmospheric_co2_ppm(year: int, doy: int) -> float:
    """Scenario CO2 [ppm] with the seasonal cosine (getCO2, hydrall.cpp)."""
    base = float(np.interp(float(year), _CO2_YEARS, _CO2_PPM))
    return base + 3.0 * np.cos(2.0 * np.pi * doy / 365.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HydrallMaps:
    """Forest state maps (hydrallMaps, criteria3DProject.h:135-138) —
    (R, C) fields plus annual accumulators."""

    plant: HydrallPlantState          # biomass pools + npp_year maps
    lai: jax.Array                    # [m2 m-2] canopy LAI
    t30_avg: jax.Array                # [degC] running ~30-day mean air T
    transpiration_year: jax.Array     # [mm]
    prec_year: jax.Array
    et0_year: jax.Array

    @staticmethod
    def initialize(shape, *, lai=4.0, t_avg=12.0) -> "HydrallMaps":
        f = lambda v: jnp.full(shape, v, jnp.float64)
        return HydrallMaps(
            plant=HydrallPlantState.initialize(shape),
            lai=f(lai), t30_avg=f(t_avg),
            transpiration_year=f(0.0), prec_year=f(0.0), et0_year=f(0.0))


def hydrall_hour(maps: HydrallMaps, *, air_temp_c, rel_humidity, beam_irr,
                 diffuse_irr, longwave_irr, sun_elevation_deg, pressure_pa,
                 prec_mm, et0_mm, year: int, doy: int, soil_stress=1.0,
                 forest_mask=None) -> tuple[HydrallMaps, dict]:
    """One hour of the HYDRALL forest model over the whole map.

    Mirrors computeHydrallPoint driven per forest cell
    (criteria3DProject.cpp:1827-1915 + hydrall.cpp photosynthesisAndTranspiration):
    sun/shade big-leaf absorption, Farquhar+Wang-Leuning coupled kernel per
    leaf class, whole-plant respiration, NPP accumulation into the annual
    pool. Returns (new_maps, dict(assimilation, transpiration_mm)).
    """
    t_air = jnp.asarray(air_temp_c, jnp.float64)
    lai = jnp.maximum(maps.lai, 0.1)
    sin_el = jnp.maximum(jnp.sin(jnp.asarray(sun_elevation_deg)
                                 * jnp.pi / 180.0), 0.0)

    es = 611.0 * jnp.exp(17.502 * t_air / (t_air + 240.97))
    rh = jnp.clip(jnp.asarray(rel_humidity), 1.0, 100.0)
    vpd = jnp.maximum(es * (1.0 - rh / 100.0), 0.0)
    t_c = t_air
    slope_sat = 4098.0 * (es / 1000.0) / ((237.3 + t_c) ** 2) * 1000.0
    psychro = 1013.0 * jnp.asarray(pressure_pa) / 1000.0 \
        / (0.622 * (2501000.0 - 2369.2 * t_c)) * 1000.0
    co2_pa = atmospheric_co2_ppm(year, doy) * 1e-6 * jnp.asarray(pressure_pa)

    absorbed = big_leaf_radiation(lai, sin_el, beam_irr, diffuse_irr, t_air,
                                  longwave_irr)
    t_sun, t_shade = leaf_temperature(t_air, beam_irr, diffuse_irr, vpd,
                                      psychro, sin_el)

    assim = jnp.zeros_like(lai)
    transp = jnp.zeros_like(lai)
    for sunlit, t_leaf in ((True, t_sun), (False, t_shade)):
        par = absorbed["par_sunlit" if sunlit else "par_shaded"]
        fp = farquhar_parameters(t_leaf, par, lai, absorbed["kb"],
                                 absorbed["kd_par"], pressure_pa,
                                 maps.t30_avg, sunlit=sunlit)
        a, _, tr = photosynthesis_kernel(
            fp, co2_pa=co2_pa, vpd_pa=vpd, pressure_pa=pressure_pa,
            air_temp_c=t_air,
            rni=absorbed["rni_sunlit" if sunlit else "rni_shaded"],
            slope_sat_vp=slope_sat, psychro_pa=psychro,
            stress=jnp.asarray(soil_stress))
        assim = assim + a
        transp = transp + tr

    resp = plant_respiration(maps.plant, t_air, jnp.asarray(soil_stress))
    npp_hour = (assim - resp) * 3600.0 * 12e-3          # [kg C m-2 h-1]
    transp_mm = jnp.maximum(transp, 0.0) * 3600.0 * 18e-3

    if forest_mask is not None:
        fm = jnp.asarray(forest_mask)
        npp_hour = jnp.where(fm, npp_hour, 0.0)
        transp_mm = jnp.where(fm, transp_mm, 0.0)

    plant = dataclasses.replace(
        maps.plant, npp_year=maps.plant.npp_year + npp_hour)
    new = dataclasses.replace(
        maps, plant=plant,
        transpiration_year=maps.transpiration_year + transp_mm,
        prec_year=maps.prec_year + jnp.asarray(prec_mm),
        et0_year=maps.et0_year + jnp.asarray(et0_mm))
    return new, dict(assimilation=assim, transpiration_mm=transp_mm,
                     respiration=resp)


def hydrall_daily_update(maps: HydrallMaps, t_avg_day) -> HydrallMaps:
    """Daily state update: the ~30-day running mean temperature feeding the
    Kattge-Knorr acclimation (mapLast30DaysTAvg, criteria3DProject.cpp)."""
    t30 = maps.t30_avg + (jnp.asarray(t_avg_day) - maps.t30_avg) / 30.0
    return dataclasses.replace(maps, t30_avg=t30)


def hydrall_annual_update(maps: HydrallMaps,
                          specific_leaf_area: float = 20.0
                          ) -> tuple[HydrallMaps, jax.Array]:
    """Jan-1 annual step (dailyUpdateHydrall, criteria3DProject.cpp:634):
    turnover + NPP allocation, LAI from the new foliage biomass, annual
    accumulators reset. Returns (new_maps, litter [kg C m-2])."""
    plant, litter = annual_growth(maps.plant,
                                  yearly_prec=maps.prec_year,
                                  yearly_et0=maps.et0_year)
    lai = jnp.clip(plant.biomass_foliage * specific_leaf_area, 0.5, 8.0)
    zero = jnp.zeros_like(maps.prec_year)
    return dataclasses.replace(
        maps, plant=plant, lai=lai, transpiration_year=zero,
        prec_year=zero, et0_year=zero), litter
