"""Grapevine-specific photosynthesis / stomatal transpiration kernel.

The reference VINE3D carries its OWN sun/shade big-leaf Farquhar +
Wang-Leuning stack, separate from the hydrall forest kernel it was derived
from (src/grapevine/grapevine.cpp:385-396 photosynthesisAndTranspiration
and the chain weatherVariables / radiationAbsorption /
aerodynamicalCoupling / upscale / photosynthesisKernelSimplified /
carbonWaterFluxesProfile, grapevine.cpp:431-1020).  Differences from
hydrall that matter for parity:

* the *simplified* fixed-point kernel (grapevine.cpp:871-925): all partial
  pressures stay in Pa, the leaf-surface CO2 ``CS`` is pinned at
  atmospheric, the leaf-surface VPD is never updated, and the stomatal
  floor is ``GSCD`` (not 1e-5);
* vine acclimation: entropic terms are linear functions of the last-month
  mean temperature (Kattge & Knorr 2007; grapevine.cpp:755-780) around the
  fixed optimum 298.15 K, Vcmax optimum from the cultivar DB
  (``hydrall_carbox_rate``, default 115 umol m-2 s-1, Greer 2011) and
  J_opt = 1.5 Vcmax (Leuning 1997);
* the per-soil-layer stress application: the kernel is re-solved for every
  root layer with ``STOMWL = alpha * sawStress[layer]``
  (carbonWaterFluxesProfile, grapevine.cpp:953-993) and the results are
  root-density weighted, plus one unstressed solve for the stress
  coefficient (carbonWaterFluxesProfileNoStress / getStressCoefficient).

Everything here is vectorised over arbitrary (R, C) (or (L, R, C)) field
shapes; the layer dimension of the stressed solve is batched into the same
kernel call rather than looped.

Upstream defect (DEVIATIONS #24): ``myPlantHeight`` is read by
aerodynamicalCoupling (grapevine.cpp:615-619) but never written anywhere
in the reference tree, so upstream computes the canopy aerodynamics from
an indeterminate value.  Here plant height is an explicit parameter
(default 1.8 m, a typical trained vine row); the golden oracle pins the
member to the same value.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from criteria3d_tpu.constants import ZEROCELSIUS

__all__ = [
    "WangLeuningParameters", "atmospheric_co2_pa", "weather_variables",
    "radiation_absorption", "aerodynamic_conductances", "upscale",
    "photosynthesis_kernel_simplified", "carbon_water_fluxes_profile",
    "vine_canopy_fluxes", "plant_respiration", "temperature_moisture_factor",
]

# ---- constants (agrolib/crop/biomass.h:7-51, shared Magnani set) ----------
R_GAS = 8.31447215           # [J mol-1 K-1] commonConstants.h:190
GAMMA = 66.2                 # [Pa K-1] psychrometer constant, biomass.h:8
OSS = 21176.0                # [Pa] O2 partial pressure, biomass.h:11
H2O_MOLECULAR_WEIGHT = 0.018  # [kg mol-1] biomass.h:10
CARBON_FACTOR = 0.5          # [kgC kgDM-1] biomass.h:7
HEAT_CAPACITY_AIR_MOLAR = 29.31   # [J mol-1 K-1] commonConstants.h:228
STEFAN_BOLTZMANN = 5.670373e-8    # [W m-2 K-4] commonConstants.h:209
CHL_DEFAULT = 500.0          # [g cm-2] biomass.h:50

HARD, CRD = 46.39, 18.72     # dark-respiration T response, biomass.h:16,24
HAVCM = 65.33                # Vcmax activation energy [kJ mol-1]
HAJM = 43.9                  # Jmax activation energy [kJ mol-1]
HAKC, CKC = 79.43, 38.05     # Kc response
HAKO, CKO = 36.38, 20.30     # Ko response
HAGSTAR, CGSTAR = 37.83, 19.02   # Gamma* response
HDEACTIVATION = 200.0        # [kJ mol-1] Kattge & Knorr 2007


@dataclasses.dataclass(frozen=True)
class WangLeuningParameters:
    """Cultivar Wang-Leuning block (TparameterWangLeuning, grapevine.h:140
    + the fixed part grapevine.cpp:269-281).  DB defaults from the fields
    DB cultivar table (``hydrall_*`` columns, vine3DProject.cpp:252-261;
    note alpha is stored as 10 and scaled by 1e5 on load)."""

    max_carbox_rate: float = 115.0        # [umol m-2 s-1] Vcmo at 25 C
    alpha: float = 10.0 * 1.0e5           # Leuning stomatal slope
    vpd_sensitivity: float = 1300.0       # [Pa]
    water_stress_threshold: float = 0.4
    stomatal_conductance_min: float = 0.008   # [mol m-2 s-1]
    optimal_temperature: float = 298.15   # [K]


def upscaling_func(k, lai):
    """(1 - exp(-k LAI)) / k  (grapevine.h:24 UPSCALINGFUNC)."""
    return (1.0 - jnp.exp(-k * lai)) / k


def atmospheric_co2_pa(year: int, doy: int, pressure_pa):
    """CO2 partial pressure [Pa] (getCO2, grapevine.cpp:398-411):
    Mauna-Loa exponential fit + seasonal cosine."""
    if year < 1990:
        ppm = 280.0 * jnp.exp(0.0014876 * (year - 1840))
    else:
        ppm = 350.0 * jnp.exp(0.00630 * (year - 1990))
    ppm = ppm + 3.0 * jnp.cos(2.0 * jnp.pi * doy / 365.0)
    return ppm * pressure_pa / 1.0e6


def weather_variables(t_air_c, rh_pct, cloudiness):
    """Derived weather terms (weatherVariables grapevine.cpp:431-437 +
    the VPD from setWeather grapevine.cpp:157-158)."""
    t_k = t_air_c + ZEROCELSIUS
    vp_air = 611.0 * jnp.exp(17.502 * t_air_c / (t_air_c + 240.97)) \
        * rh_pct / 100.0
    emissivity_sky = (1.24 * ((vp_air / 100.0) / t_k) ** (1.0 / 7.0)
                      * (1.0 - 0.84 * cloudiness) + 0.84 * cloudiness)
    longwave_irr = t_k ** 4 * emissivity_sky * STEFAN_BOLTZMANN
    slope_sat_vp = (2588464.2 / (240.97 + t_air_c) ** 2
                    * jnp.exp(17.502 * t_air_c / (240.97 + t_air_c)))
    delta_rh = jnp.maximum(100.0 - rh_pct, 0.01)
    vpd = 0.01 * delta_rh * 613.75 * jnp.exp(
        17.502 * t_air_c / (240.97 + t_air_c))
    return dict(vp_air=vp_air, emissivity_sky=emissivity_sky,
                longwave_irr=longwave_irr, slope_sat_vp=slope_sat_vp,
                vpd=vpd)


def radiation_absorption(lai, sun_elevation_deg, direct_irr, diffuse_irr,
                         t_air_c, longwave_irr, emissivity_sky,
                         chlorophyll=CHL_DEFAULT):
    """Sun/shade big-leaf absorbed PAR + isothermal net radiation
    (radiationAbsorption, grapevine.cpp:441-558; Wang & Leuning 1998).

    Returns absorbed PAR already converted to mol m-2 s-1
    (grapevine.cpp:556-557) plus the light extinction coefficients the
    upscale step reuses."""
    lai = jnp.maximum(lai, 0.01)
    sine_el = jnp.maximum(1.0e-4, jnp.sin(jnp.radians(sun_elevation_deg)))
    # hemisphericalIsotropyParameter = 0, clumpingParameter = 1 (statics)
    kb = 0.5 / sine_el
    sector = lambda s: 0.5 / s
    kd = -1.0 / lai * jnp.log(
        0.178 * jnp.exp(-sector(0.259) * lai)
        + 0.514 * jnp.exp(-sector(0.707) * lai)
        + 0.308 * jnp.exp(-sector(0.966) * lai))

    day = sine_el > 0.001
    lai_sun_day = upscaling_func(kb, lai)
    lai_sun = jnp.where(day, lai_sun_day, 0.0)
    lai_shade = lai - lai_sun

    # scattering from leaf absorbance; PAR absorbance from chlorophyll
    # (Agusti et al. 1994, grapevine.cpp:479)
    leaf_abs_par = 1.0 - 10.0 ** (
        -10.0 ** (0.28 + 0.63 * jnp.log10(chlorophyll * 0.85 / 1000.0)))
    scat_par = 1.0 - leaf_abs_par
    scat_nir = 1.0 - 0.2          # leafAbsorbanceNIR = 0.2
    sq_par = jnp.sqrt(1.0 - scat_par)
    sq_nir = jnp.sqrt(1.0 - scat_nir)
    kd_par, kd_nir = kd * sq_par, kd * sq_nir
    kb_par, kb_nir = kb * sq_par, kb * sq_nir

    refl_par = (1.0 - sq_par) / (1.0 + sq_par)
    refl_nir = (1.0 - sq_nir) / (1.0 + sq_nir)
    beam_frac = 2.0 * kb / (kb + kd)
    rho_b_par = rho_b_nir = beam_frac * refl_par
    rho_d_par = rho_d_nir = beam_frac * refl_nir
    # NB the reference assigns PAR and NIR reflection from the same dum[2]
    # and dum[3] pair (grapevine.cpp:493-494): direct uses the PAR sqrt,
    # diffuse the NIR sqrt.  Replicated verbatim above.

    ib = direct_irr * 0.5          # incoming direct PAR == NIR halves
    idf = diffuse_irr * 0.5

    d5 = idf * (1.0 - rho_d_par) * kd_par
    d6 = ib * (1.0 - rho_b_par) * kb_par
    d7 = ib * (1.0 - scat_par) * kb
    d8 = idf * (1.0 - rho_d_nir) * kd_nir
    d9 = ib * (1.0 - rho_b_nir) * kb_nir
    d10 = ib * (1.0 - scat_nir) * kb_nir
    # NB dum[10] uses directLightKNIR where the sunlit-PAR analogue d7 uses
    # directLightK (grapevine.cpp:507) — kept as-is.
    u_kd_kb = upscaling_func(kd_par + kb, lai)
    u_kb_kb = upscaling_func(kb_par + kb, lai)
    u_nir = upscaling_func(kb_nir + kb, lai)
    u_two = upscaling_func(kb, lai) - upscaling_func(2.0 * kb, lai)

    par_sun = d5 * u_kd_kb + d6 * u_kb_kb + d7 * u_two
    par_shade = (d5 * (upscaling_func(kd_par, lai) - u_kd_kb)
                 + d6 * (upscaling_func(kb_par, lai) - u_kb_kb)
                 - d7 * u_two)
    nir_sun = d8 * u_kd_kb + d9 * u_nir + d10 * u_two
    nir_shade = (d8 * (upscaling_func(kd_nir, lai) - u_kd_kb)
                 + d9 * (upscaling_func(kb_nir, lai) - u_nir)
                 - d10 * u_two)

    t_k = t_air_c + ZEROCELSIUS
    lw_net = (longwave_irr - STEFAN_BOLTZMANN * t_k ** 4) * kd
    em_leaf, em_soil = 0.96, 0.94
    lw_sun = (lw_net * upscaling_func(kb + kd, lai) * em_leaf
              + (1.0 - em_soil) * (em_leaf - emissivity_sky)
              * upscaling_func(2.0 * kd, lai) * upscaling_func(kb - kd, lai))
    lw_shade = lw_net * upscaling_func(kd, lai) - lw_sun

    # night branch (grapevine.cpp:536-552)
    night_lw_shade = lw_net * (upscaling_func(kd, lai)
                               - upscaling_func(kb + kd, lai))
    par_sun = jnp.where(day, par_sun, 0.0)
    par_shade = jnp.where(day, par_shade, 0.0)
    rni_sun = jnp.where(day, par_sun + nir_sun + lw_sun, 0.0)
    rni_shade = jnp.where(day, par_shade + nir_shade + lw_shade,
                          night_lw_shade)

    return dict(
        lai_sunlit=lai_sun, lai_shaded=lai_shade,
        par_sunlit=par_sun * 4.57e-6, par_shaded=par_shade * 4.57e-6,
        rni_sunlit=rni_sun, rni_shaded=rni_shade,
        kb=kb, kd=kd, kd_par=kd_par, sine_elevation=sine_el)


def aerodynamic_conductances(wind_speed, lai, plant_height, t_air_c,
                             pressure_pa, lai_sunlit, slope_sat_vp,
                             leaf_width=0.2, amphystomatic=True):
    """Canopy aerodynamic conductances to heat and CO2 [mol m-2 s-1]
    (aerodynamicalCoupling, grapevine.cpp:602-724).

    The reference's Monin-Obukhov iteration force-zeroes both big-leaf
    temperature offsets (grapevine.cpp:705, 713), so the sensible heat flux
    collapses to zero after the first pass and the loop always exits from
    the NEUTRAL stability state — the code below evaluates that neutral
    fixed point directly.  ``leaf_width``: the reference stores
    myLeafWidth = 0.2 and comments it *centimetres*, but feeds the literal
    0.2 into the boundary-layer sqrt unconverted (grapevine.cpp:30, 674);
    the default replicates that literal for parity."""
    karm, a_coef, beta = 0.41, 0.0067, 3.0
    wind = jnp.maximum(5.0, wind_speed)        # MAXVALUE(5, wind)!
    lai = jnp.maximum(lai, 0.01)
    h_ref = plant_height + 5.0
    dummy = 0.2 * lai
    d0 = jnp.minimum(plant_height * (jnp.log1p(dummy ** 0.166)
                                     + 0.03 * jnp.log1p(dummy ** 6)),
                     0.99 * plant_height)
    z0 = jnp.where(dummy < 0.2,
                   0.01 + 0.28 * jnp.sqrt(dummy) * plant_height,
                   0.3 * plant_height * (1.0 - d0 / plant_height))

    ustar = jnp.maximum(1.0e-4, karm * wind / jnp.log((h_ref - d0) / z0))
    wind_top = jnp.maximum(1.0e-4,
                           (ustar / karm) * jnp.log((plant_height - d0) / z0))
    g_bl = (a_coef * jnp.sqrt(wind_top / leaf_width)
            * ((2.0 / beta) * (1.0 - jnp.exp(-beta / 2.0))) * lai)
    g_am = ustar / (wind / ustar)              # neutral: dev funcs cancel
    mol = (pressure_pa / R_GAS) / (t_air_c + ZEROCELSIUS)
    g_heat = (g_am * g_bl) / (g_am + g_bl) * mol
    frac_sun = lai_sunlit / lai
    g_rad = (4.0 * (slope_sat_vp / GAMMA)
             * (STEFAN_BOLTZMANN / HEAT_CAPACITY_AIR_MOLAR)
             * (t_air_c + ZEROCELSIUS) ** 3)
    if amphystomatic:
        g_co2 = 0.78 * g_heat
    else:
        g_co2 = 0.78 * (g_am * g_bl) / (g_bl + 2.0 * g_am) * mol
    return dict(
        g_heat_sunlit=g_heat * frac_sun,
        g_heat_shaded=g_heat * (1.0 - frac_sun),
        g_total_heat_sunlit=(g_heat + g_rad) * frac_sun,
        g_total_heat_shaded=(g_heat + g_rad) * (1.0 - frac_sun),
        g_co2_sunlit=g_co2 * frac_sun,
        g_co2_shaded=g_co2 * (1.0 - frac_sun))


def leaf_width_for_stage(stage, base=0.2):
    """Stage-dependent leaf width (leafWidth, grapevine.cpp:1533-1538):
    0.2x at bud burst, 0.5x at flowering, full otherwise."""
    stage_i = jnp.floor(stage)
    return jnp.where(stage_i == 2.0, base * 0.2,
                     jnp.where(stage_i == 3.0, base * 0.5, base))


def _acclimation(ha_j, hd_j, leaf_t_k, entropic, opt_t_k):
    """acclimationFunction (grapevine.cpp:414-421), J-mol units."""
    return (jnp.exp(ha_j * (leaf_t_k - opt_t_k)
                    / (opt_t_k * R_GAS * leaf_t_k))
            * (1.0 + jnp.exp((opt_t_k * entropic - hd_j)
                             / (opt_t_k * R_GAS)))
            / (1.0 + jnp.exp((leaf_t_k * entropic - hd_j)
                             / (leaf_t_k * R_GAS))))


def upscale(rad, leaf_t_sun_k, leaf_t_shade_k, mean_month_t_c, pressure_pa,
            params: WangLeuningParameters, chlorophyll=CHL_DEFAULT):
    """Big-leaf Farquhar parameter upscaling (upscale,
    grapevine.cpp:726-813).  Returns per-big-leaf dicts with vcmax, j, kc,
    ko, gamma_star, rd, gsc_min — Pa partial-pressure units throughout.

    Stale-member deviation: at night the reference keeps the previous
    daylight values of the shaded Vcmax / minimal conductances (they are
    only assigned inside the daytime branch); here they are recomputed
    from the same formulas with the clamped sun elevation, and the J=0
    night gate in the kernel makes assimilation zero either way."""
    lai = rad["lai_sunlit"] + rad["lai_shaded"]
    kb, kd_par = rad["kb"], rad["kd_par"]
    day = rad["sine_elevation"] > 1.0e-3

    vc_opt = params.max_carbox_rate * 1.0e-6
    rd_t0 = 0.0089 * vc_opt
    dum0 = R_GAS / 1000.0 * leaf_t_sun_k      # [kJ mol-1]
    dum1 = R_GAS / 1000.0 * leaf_t_shade_k
    u_sun = upscaling_func(kb + kd_par, lai)
    u_shade = upscaling_func(kd_par, lai) - u_sun

    rd_sun = rd_t0 * jnp.exp(CRD - HARD / dum0) * u_sun
    rd_shade = rd_t0 * jnp.exp(CRD - HARD / dum1)
    rd_shade = rd_shade * u_shade

    ent_j = -0.75 * mean_month_t_c + 660.0
    ent_v = -1.07 * mean_month_t_c + 668.0
    opt_t = params.optimal_temperature

    gsc_min_sun = params.stomatal_conductance_min * u_sun
    gsc_min_shade = params.stomatal_conductance_min * u_shade

    vcmax_sun = vc_opt * _acclimation(HAVCM * 1000.0, HDEACTIVATION * 1000.0,
                                      leaf_t_sun_k, ent_v, opt_t) * u_sun
    vcmax_shade = vc_opt * _acclimation(HAVCM * 1000.0,
                                        HDEACTIVATION * 1000.0,
                                        leaf_t_shade_k, ent_v, opt_t) * u_shade

    kc_sun = jnp.exp(CKC - HAKC / dum0) * 1.0e-6 * pressure_pa
    kc_shade = jnp.exp(CKC - HAKC / dum1) * 1.0e-6 * pressure_pa
    ko_sun = jnp.exp(CKO - HAKO / dum0) * 1.0e-3 * pressure_pa
    ko_shade = jnp.exp(CKO - HAKO / dum1) * 1.0e-3 * pressure_pa
    comp_sun = jnp.exp(CGSTAR - HAGSTAR / dum0) * 1.0e-6 * pressure_pa
    comp_shade = jnp.exp(CGSTAR - HAGSTAR / dum1) * 1.0e-6 * pressure_pa

    j_opt = 1.5 * vc_opt
    j_sun = j_opt * _acclimation(HAJM * 1000.0, HDEACTIVATION * 1000.0,
                                 leaf_t_sun_k, ent_j, opt_t) * u_sun
    j_shade = j_opt * _acclimation(HAJM * 1000.0, HDEACTIVATION * 1000.0,
                                   leaf_t_shade_k, ent_j, opt_t) * u_shade

    def non_rect(j_big, absorbed_par, t_c):
        quantum = 0.352 + 0.022 * t_c - 3.4e-4 * t_c ** 2
        convexity = ((1.0 - chlorophyll * 6.93e-4) / 0.98
                     * (0.76 + 0.018 * t_c - 3.7e-4 * t_c ** 2))
        i2 = absorbed_par * quantum * 0.5     # BETA = 0.5
        s = i2 + j_big
        p = i2 * j_big
        return (s - jnp.sqrt(s * s - 4.0 * convexity * p)) / (2.0 * convexity)

    j_sun = non_rect(j_sun, rad["par_sunlit"], leaf_t_sun_k - ZEROCELSIUS)
    j_shade = non_rect(j_shade, rad["par_shaded"],
                       leaf_t_shade_k - ZEROCELSIUS)

    # night gate (grapevine.cpp:805-811): J and sunlit Vcmax/RD zeroed
    j_sun = jnp.where(day, j_sun, 0.0)
    j_shade = jnp.where(day, j_shade, 0.0)
    rd_sun = jnp.where(day, rd_sun, 0.0)
    vcmax_sun = jnp.where(day, vcmax_sun, 0.0)

    sunlit = dict(vcmax=vcmax_sun, j=j_sun, kc=kc_sun, ko=ko_sun,
                  gamma_star=comp_sun, rd=rd_sun, gsc_min=gsc_min_sun)
    shaded = dict(vcmax=vcmax_shade, j=j_shade, kc=kc_shade, ko=ko_shade,
                  gamma_star=comp_shade, rd=rd_shade, gsc_min=gsc_min_shade)
    return sunlit, shaded


def photosynthesis_kernel_simplified(leaf, *, co2_pa, pressure_pa, vpd_pa,
                                     stomwl, vpd_sensitivity,
                                     max_iter=1000, tol=1.0e-7):
    """The vine fixed-point kernel (photosynthesisKernelSimplified,
    grapevine.cpp:871-925): iterate gross assimilation / stomatal
    conductance / stromal CO2 with the leaf-surface CO2 pinned at
    atmospheric and the VPD never updated.  Vectorised with a
    whole-field while_loop on the max assimilation delta (converged cells
    sit at their fixed point).  Returns (assimilation [mol CO2 m-2 s-1],
    gsc [mol m-2 s-1], transpiration [mol H2O m-2 s-1])."""
    j, vcmax = leaf["j"], leaf["vcmax"]
    kc, ko = leaf["kc"], leaf["ko"]
    comp, rd, gscd = leaf["gamma_star"], leaf["rd"], leaf["gsc_min"]
    shape = jnp.broadcast_shapes(jnp.shape(j), jnp.shape(stomwl))
    j = jnp.broadcast_to(j, shape)
    cs = jnp.broadcast_to(co2_pa, shape)
    vpd_term = vpd_sensitivity / (vpd_sensitivity + vpd_pa)

    def step(cc):
        wc = vcmax * cc / (cc + kc * (1.0 + OSS / ko))
        wj = j * cc / (4.5 * cc + 10.5 * comp)
        vc = jnp.minimum(wc, wj)
        ass = jnp.maximum(0.0, vc * (1.0 - comp / cc))
        gsc = gscd + stomwl * (ass - rd) / (cs - comp) * vpd_term
        gsc = jnp.maximum(gsc, gscd)
        cc_new = jnp.maximum(1.0e-2, cs - pressure_pa * (ass - rd) / gsc)
        return cc_new, ass, gsc

    # per-cell stopping, replicating the reference's scalar loop exactly:
    # each cell FREEZES once its own |dASS| <= tol (the Leuning slope
    # amplifies the stopping slop into GSC, so converging further than the
    # reference would visibly shift the stomatal conductance)
    def cond(carry):
        i, _, _, _, done = carry
        return (i < max_iter) & ~jnp.all(done)

    def body(carry):
        i, cc, ass_old, gsc_old, done = carry
        cc2, ass, gsc = step(cc)
        newly_done = jnp.abs(ass - ass_old) <= tol
        cc2 = jnp.where(done, cc, cc2)
        ass = jnp.where(done, ass_old, ass)
        gsc = jnp.where(done, gsc_old, gsc)
        return i + 1, cc2, ass, gsc, done | newly_done

    cc1, ass1, gsc1 = step(0.7 * cs)     # bootstrap establishes ass_old
    zero = jnp.zeros_like(ass1)
    _, _, ass, gsc, _ = jax.lax.while_loop(
        cond, body, (1, cc1, ass1, gsc1,
                     jnp.zeros(jnp.shape(ass1), bool)))

    night = j < 1.0e-7
    ass = jnp.where(night, 0.0, ass)
    gsc = jnp.where(night, gscd + zero, gsc)
    tr = jnp.maximum(1.0e-8, (gsc / 0.64) * vpd_pa / pressure_pa)
    return ass, gsc, tr


def carbon_water_fluxes_profile(sunlit, shaded, *, co2_pa, pressure_pa,
                                vpd_pa, alpha, vpd_sensitivity,
                                stress_profile, root_density):
    """Per-root-layer stressed solve + root-density aggregation
    (carbonWaterFluxesProfile grapevine.cpp:953-993 + the NoStress variant
    :995-1020 + getStressCoefficient :1043-1055).

    ``stress_profile``/``root_density``: (L, ...) leading layer axis; the
    layer axis is batched straight into the kernel.  Returns a dict with
    assimilation [mol CO2 m-2 s-1], per-layer transpiration
    [mol H2O m-2 s-1] (L, ...), canopy conductance, the unstressed
    transpiration and the stomatal stress coefficient."""
    stress_profile = jnp.asarray(stress_profile)
    root_density = jnp.asarray(root_density)
    stomwl = alpha * stress_profile
    kw = dict(co2_pa=co2_pa, pressure_pa=pressure_pa, vpd_pa=vpd_pa,
              vpd_sensitivity=vpd_sensitivity)
    ass_sun, gsc_sun, tr_sun = photosynthesis_kernel_simplified(
        sunlit, stomwl=stomwl, **kw)
    ass_sh, gsc_sh, tr_sh = photosynthesis_kernel_simplified(
        shaded, stomwl=stomwl, **kw)
    # sunlit big-leaf only where it exists (grapevine.cpp:963-977)
    has_sun = sunlit["j"] + sunlit["vcmax"] > 0.0
    ass_sun = jnp.where(has_sun, ass_sun, 0.0)
    gsc_sun = jnp.where(has_sun, gsc_sun, 0.0)
    tr_sun = jnp.where(has_sun, tr_sun, 0.0)

    assimilation = jnp.sum((ass_sun + ass_sh) * root_density, axis=0)
    transp_layer = (tr_sun + tr_sh) * root_density
    total_gs = jnp.sum((gsc_sun + gsc_sh) * root_density, axis=0)

    a0_sun, g0_sun, t0_sun = photosynthesis_kernel_simplified(
        sunlit, stomwl=jnp.asarray(alpha, jnp.result_type(float)), **kw)
    a0_sh, g0_sh, t0_sh = photosynthesis_kernel_simplified(
        shaded, stomwl=jnp.asarray(alpha, jnp.result_type(float)), **kw)
    g0_sun = jnp.where(has_sun, g0_sun, 0.0)
    t0_sun = jnp.where(has_sun, t0_sun, 0.0)
    w = jnp.sum(root_density, axis=0)
    total_gs_nostress = (g0_sun + g0_sh) * w
    transp_nostress = (t0_sun + t0_sh) * w

    stress_coeff = jnp.maximum(
        0.0, 1.0 - jnp.where(total_gs_nostress > 0.0,
                             total_gs / jnp.maximum(total_gs_nostress,
                                                    1.0e-30), 1.0))
    return dict(assimilation=assimilation, transpiration_layer=transp_layer,
                total_stomatal_conductance=total_gs,
                transpiration_nostress=transp_nostress,
                stress_coefficient=stress_coeff)


def vine_canopy_fluxes(*, lai, sun_elevation_deg, direct_irr, diffuse_irr,
                       cloudiness, t_air_c, rh_pct, wind_speed, pressure_pa,
                       mean_month_t_c, stress_profile, root_density,
                       year: int, doy: int,
                       params: WangLeuningParameters = WangLeuningParameters(),
                       plant_height=1.8, chlorophyll=CHL_DEFAULT,
                       stage=None):
    """The full photosynthesisAndTranspiration chain
    (grapevine.cpp:385-396) on whole fields.  Leaf temperatures equal air
    temperature (the reference zeroes both deltas, grapevine.cpp:705,713).

    Jitted with a module-level cache (static: year, params, chlorophyll,
    plant_height, has-stage) so the hourly driver pays one compile per
    shape, not one trace per call.

    Returns the carbon_water_fluxes_profile dict plus the absorbed PAR and
    the aerodynamic conductances (for the energy-balance consumers)."""
    lw = jnp.asarray(0.2 if stage is None
                     else leaf_width_for_stage(stage), jnp.float64)
    return _canopy_fluxes_jit(
        jnp.asarray(lai, jnp.float64),
        jnp.asarray(sun_elevation_deg, jnp.float64),
        jnp.asarray(direct_irr, jnp.float64),
        jnp.asarray(diffuse_irr, jnp.float64),
        jnp.asarray(cloudiness, jnp.float64),
        jnp.asarray(t_air_c, jnp.float64), jnp.asarray(rh_pct, jnp.float64),
        jnp.asarray(wind_speed, jnp.float64),
        jnp.asarray(pressure_pa, jnp.float64),
        jnp.asarray(mean_month_t_c, jnp.float64),
        jnp.asarray(stress_profile, jnp.float64),
        jnp.asarray(root_density, jnp.float64),
        jnp.asarray(doy, jnp.float64), lw,
        jnp.asarray(plant_height, jnp.float64),
        year=year, params=params, chlorophyll=float(chlorophyll))


@functools.partial(jax.jit,
                   static_argnames=("year", "params", "chlorophyll"))
def _canopy_fluxes_jit(lai, sun_elevation_deg, direct_irr, diffuse_irr,
                       cloudiness, t_air_c, rh_pct, wind_speed, pressure_pa,
                       mean_month_t_c, stress_profile, root_density,
                       doy, leaf_width, plant_height, *,
                       year, params, chlorophyll):
    wx = weather_variables(t_air_c, rh_pct, cloudiness)
    rad = radiation_absorption(lai, sun_elevation_deg, direct_irr,
                               diffuse_irr, t_air_c, wx["longwave_irr"],
                               wx["emissivity_sky"], chlorophyll)
    aero = aerodynamic_conductances(wind_speed, lai, plant_height, t_air_c,
                                    pressure_pa, rad["lai_sunlit"],
                                    wx["slope_sat_vp"],
                                    leaf_width=leaf_width)
    leaf_t = t_air_c + ZEROCELSIUS
    sunlit, shaded = upscale(rad, leaf_t, leaf_t, mean_month_t_c,
                             pressure_pa, params, chlorophyll)
    co2 = atmospheric_co2_pa(year, doy, pressure_pa)
    out = carbon_water_fluxes_profile(
        sunlit, shaded, co2_pa=co2, pressure_pa=pressure_pa, vpd_pa=wx["vpd"],
        alpha=params.alpha, vpd_sensitivity=params.vpd_sensitivity,
        stress_profile=stress_profile, root_density=root_density)
    out.update(absorbed_par=rad["par_sunlit"] + rad["par_shaded"],
               aerodynamics=aero, vpd_pa=wx["vpd"])
    return out


def temperature_moisture_factor(t_k, psi_soil_avg, psi_fc_avg,
                                wilting_point, opt_t_k=298.15):
    """Lloyd & Taylor respiration modifier x soil-moisture correction
    (temperatureMoistureFunction MODEL 2, grapevine.cpp:1116-1167).
    Potentials in kPa, negative-down like the reference's profile."""
    moisture = jnp.where(
        psi_soil_avg >= psi_fc_avg, 1.0,
        jnp.where(psi_soil_avg <= wilting_point, 0.0,
                  jnp.log(wilting_point / psi_soil_avg)
                  / jnp.log(wilting_point / psi_fc_avg)))
    t_factor = jnp.exp(308.56 * (1.0 / (opt_t_k + 46.02)
                                 - 1.0 / (t_k + 46.02)))
    return t_factor * moisture


def plant_respiration(*, cumulated_biomass, fruit_biomass, days_after_bloom,
                      t_air_c, mean_month_t_c, psi_soil_avg, psi_fc_avg,
                      wilting_point, opt_t_k=298.15):
    """Hourly whole-vine maintenance respiration [mol CO2 m-2 s-1]
    (plantRespiration, grapevine.cpp:1080-1106; Schreiner 2006 fine-root /
    sapwood biomass, soilTemperatureModel grapevine.cpp:1108-1114)."""
    n_leaf, n_shoot, n_root, n_stem = 0.02, 0.012, 0.0078, 0.0021
    b_leaf = b_shoot = (cumulated_biomass - fruit_biomass) / 2.0
    dab = jnp.minimum(1.0, days_after_bloom)
    b_fine_root = 1.5e-4 * dab
    b_sapwood = 2.0e-4 * dab
    r_leaf = 0.0106 / 2.0 * (b_leaf * n_leaf / 0.014)
    r_shoot = 0.0106 / 2.0 * (b_shoot * n_shoot / 0.014)
    r_sap = 0.0106 / 2.0 * (b_sapwood * n_stem / 0.014)
    r_root = 0.0106 / 2.0 * (b_fine_root * n_root / 0.014)
    soil_t = 0.8 * mean_month_t_c + 0.2 * t_air_c
    r_root = r_root * jnp.clip(
        temperature_moisture_factor(soil_t + ZEROCELSIUS, psi_soil_avg,
                                    psi_fc_avg, wilting_point, opt_t_k),
        0.0, 1.0)
    return (r_leaf + r_sap + r_root + r_shoot) / 3600.0
