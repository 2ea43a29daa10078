"""Solar radiation on a DEM: sun position, clear/real sky, shadowing.

Vectorised TPU re-expression of the reference's r.sun-style radiation stack
(agrolib/solarRadiation): the Michalsky/SOLPOS solar position
(solPos.cpp:423-925), Linke-turbidity clear-sky beam+diffuse
(solarRadiation.cpp:340-394, Rigollier 2000), the Erbs-Reindl
diffuse/global transmissivity split (solarRadiation.cpp:638-700), Muneer
inclined-surface conversion (solarRadiation.cpp:472-540) and DEM shadowing
(solarRadiation.cpp:547-617).

The reference's per-DEM-row OpenMP loop (solarRadiation.cpp:1045-1069
computeRadiationDEM) becomes one fused element-wise pass over (R, C) maps;
the per-point shadow ray-march becomes a fixed budget of whole-map shifted
comparisons (one integer-offset shift per step up the sun direction).
"""

from __future__ import annotations

import dataclasses
import math

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from criteria3d_tpu.constants import DEG_TO_RAD, RAD_TO_DEG, NODATA
from criteria3d_tpu.physics.meteo import pressure_from_altitude

__all__ = ["sun_position", "clear_sky_radiation", "RadiationOutput",
           "compute_radiation_dem", "separate_transmissivity_erbs_reindl",
           "shadow_map"]

SOLAR_CONSTANT = 1367.0     # [W m-2]
TEMPERATURE_DEFAULT = 15.0  # [degC]


# ----------------------------------------------------------------------
# Sun position (Michalsky 1988 via NREL SOLPOS; solPos.cpp:423-925)
# ----------------------------------------------------------------------

def _day_of_year(year, month, day):
    month_days = np.array([0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334])
    doy = month_days[month - 1] + day
    leap = (year % 4 == 0) and (month > 2)
    return doy + (1 if leap else 0)


def sun_position(lat_deg, lon_deg, timezone, year, month, day,
                 hour, minute=0, second=0, *, temperature=TEMPERATURE_DEFAULT,
                 pressure_hpa=None, aspect_deg=0.0, slope_deg=0.0):
    """Apparent solar position for arrays of (lat, lon[, aspect, slope]).

    Returns a dict of arrays: elevation, elevation_refr, azimuth [deg],
    cos_incidence (tilted surface), air_mass, air_mass_press, etr_normal,
    etr_horizontal [W m-2], sunrise_s / sunset_s [s from local midnight].
    Time arguments are Python scalars (local standard time, as the reference
    passes after its UTC shift).
    """
    lat = jnp.asarray(lat_deg, jnp.float64)
    lon = jnp.asarray(lon_deg, jnp.float64)
    if pressure_hpa is None:
        pressure_hpa = jnp.full_like(lat, 1013.0)

    daynum = _day_of_year(year, month, day)
    dayang = 360.0 * (daynum - 1) / 365.0
    sd_, cd_ = math.sin(math.radians(dayang)), math.cos(math.radians(dayang))
    s2, c2 = math.sin(2 * math.radians(dayang)), math.cos(2 * math.radians(dayang))
    erv = 1.000110 + 0.034221 * cd_ + 0.001280 * sd_ + 0.000719 * c2 + 0.000077 * s2

    utime = (hour * 3600.0 + minute * 60.0 + second) / 3600.0 - timezone
    delta = year - 1949
    leap = int(delta / 4.0)
    julday = 32916.5 + delta * 365.0 + leap + daynum + utime / 24.0
    ectime = julday - 51545.0

    mnlong = (280.460 + 0.9856474 * ectime) % 360.0
    mnanom = math.radians((357.528 + 0.9856003 * ectime) % 360.0)
    eclong = math.radians((mnlong + 1.915 * math.sin(mnanom)
                           + 0.020 * math.sin(2.0 * mnanom)) % 360.0)
    ecobli = math.radians(23.439 - 4.0e-07 * ectime)

    declin = math.asin(math.sin(ecobli) * math.sin(eclong))
    rascen = math.degrees(math.atan2(math.cos(ecobli) * math.sin(eclong),
                                     math.cos(eclong))) % 360.0

    gmst = (6.697375 + 0.0657098242 * ectime + utime) % 24.0
    lmst = (gmst * 15.0 + lon) % 360.0
    hrang = lmst - rascen
    hrang = jnp.where(hrang < -180.0, hrang + 360.0,
                      jnp.where(hrang > 180.0, hrang - 360.0, hrang))

    # zenith (zen_no_ref)
    sl = jnp.sin(lat * DEG_TO_RAD)
    cl = jnp.cos(lat * DEG_TO_RAD)
    sd = math.sin(declin)
    cd = math.cos(declin)
    ch = jnp.cos(hrang * DEG_TO_RAD)
    cz = jnp.clip(sd * sl + cd * cl * ch, -1.0, 1.0)
    zenetr = jnp.minimum(jnp.arccos(cz) * RAD_TO_DEG, 99.0)
    elevetr = 90.0 - zenetr

    # sunset hour angle + sunrise/sunset (ssha + srss + tst)
    cdcl = cd * cl
    cssha = jnp.where(jnp.abs(cdcl) >= 0.001, -sl * sd / jnp.where(
        jnp.abs(cdcl) >= 0.001, cdcl, 1.0), 0.0)
    ssha = jnp.where(jnp.abs(cdcl) >= 0.001,
                     jnp.arccos(jnp.clip(cssha, -1.0, 1.0)) * RAD_TO_DEG,
                     jnp.where((declin >= 0) == (lat > 0), 180.0, 0.0))
    tst = (180.0 + hrang) * 4.0
    tstfix = tst - hour * 60.0 - minute - second / 60.0
    tstfix = jnp.mod(tstfix + 720.0, 1440.0) - 720.0
    sretr = jnp.where(ssha <= 1.0, 2999.0,
                      jnp.where(ssha >= 179.0, -2999.0,
                                720.0 - 4.0 * ssha - tstfix))
    ssetr = jnp.where(ssha <= 1.0, -2999.0,
                      jnp.where(ssha >= 179.0, 2999.0,
                                720.0 + 4.0 * ssha - tstfix))

    # azimuth (sazm)
    ce = jnp.cos(elevetr * DEG_TO_RAD)
    se = jnp.sin(elevetr * DEG_TO_RAD)
    cecl = ce * cl
    ca = jnp.clip((se * sl - sd) / jnp.where(jnp.abs(cecl) >= 0.001, cecl, 1.0),
                  -1.0, 1.0)
    azim = jnp.where(jnp.abs(cecl) >= 0.001,
                     180.0 - jnp.arccos(ca) * RAD_TO_DEG, 180.0)
    azim = jnp.where((jnp.abs(cecl) >= 0.001) & (hrang > 0), 360.0 - azim, azim)

    # refraction (refrac)
    tanelev = jnp.tan(jnp.clip(elevetr, -9.0, 85.0) * DEG_TO_RAD)
    tanelev = jnp.where(jnp.abs(tanelev) < 1e-9, 1e-9, tanelev)
    refcor_hi = 58.1 / tanelev - 0.07 / tanelev ** 3 + 0.000086 / tanelev ** 5
    refcor_mid = 1735.0 + elevetr * (-518.2 + elevetr * (103.4 + elevetr
                                     * (-12.79 + elevetr * 0.711)))
    refcor_lo = -20.774 / tanelev
    refcor = jnp.where(elevetr > 85.0, 0.0,
                       jnp.where(elevetr >= 5.0, refcor_hi,
                                 jnp.where(elevetr >= -0.575, refcor_mid,
                                           refcor_lo)))
    prestemp = (pressure_hpa * 283.0) / (1013.0 * (273.0 + temperature))
    elevref = jnp.maximum(elevetr + refcor * prestemp / 3600.0, -9.0)
    zenref = 90.0 - elevref
    coszen = jnp.cos(zenref * DEG_TO_RAD)

    # air mass (amass, Kasten & Young 1989)
    amass = jnp.where(
        zenref > 93.0, -1.0,
        1.0 / (jnp.cos(zenref * DEG_TO_RAD)
               + 0.50572 * jnp.maximum(96.07995 - zenref, 1e-6) ** -1.6364))
    ampress = jnp.where(zenref > 93.0, -1.0, amass * pressure_hpa / 1013.0)

    # extraterrestrial irradiance (etr)
    etrn = jnp.where(coszen > 0, SOLAR_CONSTANT * erv, 0.0)
    etr_h = jnp.where(coszen > 0, etrn * coszen, 0.0)

    # tilted-surface incidence (tilt): aspect/slope arrays
    aspect = jnp.asarray(aspect_deg, jnp.float64)
    slope = jnp.asarray(slope_deg, jnp.float64)
    sz = jnp.sin(zenref * DEG_TO_RAD)
    cosinc = (coszen * jnp.cos(slope * DEG_TO_RAD)
              + sz * jnp.sin(slope * DEG_TO_RAD)
              * (jnp.cos(azim * DEG_TO_RAD) * jnp.cos(aspect * DEG_TO_RAD)
                 + jnp.sin(azim * DEG_TO_RAD) * jnp.sin(aspect * DEG_TO_RAD)))
    # reference converts to an incidence angle >= 0 (solarRadiation.cpp:1126)
    incidence = jnp.maximum(
        0.0, RAD_TO_DEG * (jnp.pi / 2.0 - jnp.arccos(jnp.clip(cosinc, -1, 1))))

    return dict(elevation=elevetr, elevation_refr=elevref, azimuth=azim,
                incidence=incidence, cos_incidence=cosinc,
                air_mass=amass, air_mass_press=ampress,
                etr_normal=etrn, etr_horizontal=etr_h,
                sunrise_s=sretr * 60.0, sunset_s=ssetr * 60.0)


# ----------------------------------------------------------------------
# Clear sky (Linke) and transmissivity separation
# ----------------------------------------------------------------------

def clear_sky_beam_horizontal(linke, sun):
    """[W m-2] ESRA clear-sky beam (solarRadiation.cpp:340-357)."""
    m = jnp.maximum(sun["air_mass_press"], 0.0)
    rayleigh = jnp.where(
        m <= 20,
        1.0 / (6.6296 + 1.7513 * m - 0.1202 * m ** 2 + 0.0065 * m ** 3
               - 0.00013 * m ** 4),
        1.0 / (10.4 + 0.718 * m))
    return (sun["etr_normal"] * jnp.sin(sun["elevation_refr"] * DEG_TO_RAD)
            * jnp.exp(-0.8662 * linke * m * rayleigh))


def clear_sky_diffuse_horizontal(linke, sun):
    """[W m-2] Rigollier 2000 clear-sky diffuse (solarRadiation.cpp:365-391)."""
    trd = jnp.maximum(-0.015843 + linke * (0.030543 + 0.0003797 * linke), 1e-6)
    sin_elev = jnp.maximum(jnp.sin(sun["elevation_refr"] * DEG_TO_RAD), 1e-5)
    a0 = 0.26463 + linke * (-0.061581 + 0.0031408 * linke)
    a0 = jnp.where(a0 * trd < 0.0022, 0.002 / trd, a0)
    a1 = 2.0402 + linke * (0.018945 - 0.011161 * linke)
    a2 = -1.3025 + linke * (0.039231 + 0.0085079 * linke)
    fd = a0 + a1 * sin_elev + a2 * sin_elev ** 2
    return jnp.where(sun["elevation_refr"] <= 1e-3, 0.0,
                     sun["etr_normal"] * fd * trd)


def separate_transmissivity_erbs_reindl(clear_sky_trans, transmissivity,
                                        sun_elev_deg):
    """(diffuse_trans, global_trans): Erbs 1982 + Reindl 1990 split
    (solarRadiation.cpp:638-700)."""
    tt = jnp.clip(transmissivity, 1e-6, clear_sky_trans)
    kt = jnp.clip(tt / jnp.maximum(clear_sky_trans, 1e-6), 0.0, 1.2)
    sin_elev = jnp.maximum(jnp.sin(sun_elev_deg * DEG_TO_RAD), 1e-4)
    kd = jnp.where(
        kt <= 0.22, 1.0 - 0.09 * kt,
        jnp.where(kt <= 0.80,
                  0.9511 - 0.1604 * kt + 4.388 * kt ** 2 - 16.638 * kt ** 3
                  + 12.336 * kt ** 4,
                  0.165))
    kd = jnp.where(sun_elev_deg > 0,
                   kd + (0.10 + 0.12 * sun_elev_deg / 90.0)
                   * (1.0 - jnp.exp(-1.0 / sin_elev)),
                   kd)
    kd = jnp.clip(kd, 0.0, 1.0)
    return tt * kd, tt


def beam_inclined(bh, sun):
    """(solarRadiation.cpp:397-403)"""
    sin_elev = jnp.maximum(jnp.sin(sun["elevation_refr"] * DEG_TO_RAD), 1e-6)
    sin_inc = jnp.maximum(jnp.sin(sun["incidence"] * DEG_TO_RAD), 0.0)
    return bh * sin_inc / sin_elev


def diffuse_inclined_muneer(bh, dh, sun, slope_deg, aspect_deg, shadow):
    """Muneer 1990 anisotropic diffuse on a slope (solarRadiation.cpp:472-521)."""
    slope_rad = slope_deg * DEG_TO_RAD
    elev_rad = sun["elevation_refr"] * DEG_TO_RAD
    sin_elev = jnp.maximum(jnp.sin(elev_rad), 1e-6)
    sin_slope = jnp.sin(slope_rad)
    cos_slope = jnp.cos(slope_rad)

    kb = jnp.clip(bh / jnp.maximum(sun["etr_normal"] * sin_elev, 1e-6), 0.0, 1.2)
    r_sky = (1.0 + cos_slope) / 2.0
    fg = sin_slope - slope_rad * cos_slope \
        - jnp.pi * jnp.sin(slope_rad * 0.5) ** 2

    shaded = shadow | (sun["incidence"] <= 0.1)
    low_sun = sun["elevation_refr"] < 3.0

    n = 0.00263 - kb * (0.712 + 0.6883 * kb)
    term_beam = jnp.sin(sun["incidence"] * DEG_TO_RAD) / sin_elev
    az_diff = jnp.mod(sun["azimuth"] * DEG_TO_RAD - aspect_deg * DEG_TO_RAD
                      + 2 * jnp.pi, 2 * jnp.pi)
    denom2 = jnp.maximum(0.05, 0.1 - 0.008 * elev_rad)
    fx_sunny = jnp.where(
        ~low_sun,
        (n * fg + r_sky) * (1.0 - kb) + kb * term_beam,
        (n * fg + r_sky) * (1.0 - kb) + kb * sin_slope * jnp.cos(az_diff) / denom2)
    fx = jnp.where(shaded, r_sky + fg * 0.252271, fx_sunny)
    return jnp.where(sun["elevation_refr"] < 1e-6, 0.0, dh * fx)


def reflected_irradiance(bh, dh, albedo, slope_deg):
    """Muneer 1997 ground-reflected (solarRadiation.cpp:527-535)."""
    a = jnp.clip(albedo, 0.0, 1.0)
    return jnp.where(slope_deg < 1e-6, 0.0,
                     a * (bh + dh) * (1.0 - jnp.cos(slope_deg * DEG_TO_RAD)) / 2.0)


# ----------------------------------------------------------------------
# transmissivity estimation from observations
# ----------------------------------------------------------------------

def transmissivity_samani(t_min, t_max, samani_coeff=0.17):
    """Atmospheric transmissivity from the daily temperature range
    (computePointTransmissivitySamani, transmissivity.cpp:36-46)."""
    return jnp.where(t_max >= t_min,
                     samani_coeff * jnp.sqrt(jnp.maximum(t_max - t_min, 0.0)),
                     NODATA)


def transmissivity_from_measured(observed_rad, potential_rad,
                                 clear_sky_transmissivity=0.75):
    """Transmissivity = clearSky · Σobserved/Σpotential over a moving window
    (radiation::computePointTransmissivity semantics used by
    computeTransmissivity, transmissivity.cpp:105-170).

    observed_rad / potential_rad: arrays over the window (NODATA gaps in the
    observations are skipped together with their potential counterpart).
    """
    obs = jnp.asarray(observed_rad, jnp.float64)
    pot = jnp.asarray(potential_rad, jnp.float64)
    ok = obs != NODATA
    sum_obs = jnp.sum(jnp.where(ok, obs, 0.0))
    sum_pot = jnp.sum(jnp.where(ok, pot, 0.0))
    enough = jnp.sum(ok) >= 0.66 * obs.shape[-1]
    ratio = jnp.where(sum_pot > 0, sum_obs / jnp.maximum(sum_pot, 1e-9), 0.0)
    t = jnp.clip(ratio, 0.0, 1.0) * clear_sky_transmissivity
    return jnp.where(enough, t, NODATA)


# ----------------------------------------------------------------------
# DEM shadowing
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_steps",))
def _shadow_ray_march(z, sin_az, cos_az, step_z, max_steps: int):
    """Up-sun ray march with the sun direction as TRACED scalars.

    One compiled program serves every hour of every day: with static
    per-step integer shifts (the previous formulation) XLA recompiled
    ~2x max_steps shift programs per distinct sun azimuth — i.e. every
    simulated hour — which dominated whole-project runtimes.
    """
    R, C = z.shape
    rows = jnp.arange(R)[:, None]
    cols = jnp.arange(C)[None, :]

    def body(shadowed, k):
        kf = k.astype(z.dtype)
        # azimuth 0 = north = row-1 direction; x east = +col, y north = -row.
        # floor(x + 0.5) (round-half-up), matching the reference's
        # real-coordinate march + getRowCol cell-centre lookup
        # (computeShadow, solarRadiation.cpp:547-617) — jnp.round would
        # round half-to-even and systematically pick different cells on
        # diagonal rays
        dc = jnp.floor(kf * sin_az + 0.5).astype(jnp.int32)
        dr = jnp.floor(-kf * cos_az + 0.5).astype(jnp.int32)
        zk = jnp.roll(z, shift=(-dr, -dc), axis=(0, 1))
        inside = (rows + dr >= 0) & (rows + dr < R) \
            & (cols + dc >= 0) & (cols + dc < C)
        zk = jnp.where(inside, zk, -1e9)
        los = z + kf * step_z
        hit = (zk - los > 0.5) & ~((dr == 0) & (dc == 0))
        return shadowed | hit, None

    shadowed, _ = lax.scan(body, jnp.zeros(z.shape, bool),
                           jnp.arange(1, max_steps + 1))
    return shadowed


def shadow_map(dem, valid, cell_size, azimuth_deg, elevation_deg,
               max_steps: int = 128):
    """Boolean (R, C) map: True where the cell is shadowed by terrain.

    Whole-map reformulation of the reference's per-point up-sun ray march
    (computeShadow, solarRadiation.cpp:547-617): for a fixed number of steps
    k, compare dem shifted by the integer offset nearest to k x (sun
    direction) against the local line-of-sight height z0 + k*step_z; shaded
    when the terrain exceeds it by > 0.5 m anywhere along the ray.

    azimuth_deg / elevation_deg are map-averaged scalars (across a catchment
    the sun direction varies by < 0.01 deg).
    """
    elev = float(elevation_deg) * math.pi / 180.0
    if elev <= 0:
        return jnp.ones_like(valid, dtype=bool) & valid

    az = float(azimuth_deg) * math.pi / 180.0
    step_z = cell_size * math.tan(max(elev, 1e-6))
    z = jnp.where(valid, dem, -1e9)
    shadowed = _shadow_ray_march(
        z, jnp.asarray(math.sin(az), z.dtype),
        jnp.asarray(math.cos(az), z.dtype),
        jnp.asarray(step_z, z.dtype), max_steps)
    return shadowed & valid


# ----------------------------------------------------------------------
# Whole-DEM driver
# ----------------------------------------------------------------------

@dataclasses.dataclass
class RadiationOutput:
    global_irr: jax.Array     # [W m-2]
    beam: jax.Array
    diffuse: jax.Array
    reflected: jax.Array
    sun: dict


def compute_radiation_dem(dem, valid, cell_size, lat_deg, lon_deg,
                          slope_deg, aspect_deg, timezone,
                          year, month, day, hour, *,
                          linke=3.5, albedo=0.2,
                          clear_sky_transmissivity=0.75,
                          transmissivity=None,
                          shadowing=True) -> RadiationOutput:
    """Clear/real-sky irradiance maps for one instant on the whole DEM.

    Mirrors computeRadiationRsun + computeRadiationDEM
    (solarRadiation.cpp:700-830, 1045-1069) with the Linke clear-sky
    algorithm; when ``transmissivity`` maps are given the real-sky scaling
    Gh = Ghc x T/Tcs is applied with the Erbs-Reindl diffuse fraction.
    """
    height = jnp.where(valid, dem, 0.0)
    pressure = pressure_from_altitude(height) * 0.01   # [hPa]
    sun = sun_position(lat_deg, lon_deg, timezone, year, month, day, hour,
                       pressure_hpa=pressure,
                       aspect_deg=aspect_deg, slope_deg=slope_deg)

    illuminated = sun["elevation_refr"] > 0.0
    if shadowing:
        # map-mean sun direction (varies < 0.01 deg across a catchment);
        # host-side floats: the shadow march needs concrete integer offsets
        nv = float(jnp.sum(valid))
        az = float(jnp.sum(jnp.where(valid, sun["azimuth"], 0.0)) / max(nv, 1.0))
        elev = float(jnp.sum(jnp.where(valid, sun["elevation_refr"], 0.0))
                     / max(nv, 1.0))
        shadow = shadow_map(dem, valid, cell_size, az, elev)
    else:
        shadow = jnp.zeros_like(valid, dtype=bool)

    bhc = clear_sky_beam_horizontal(linke, sun)
    dhc = clear_sky_diffuse_horizontal(linke, sun)
    ghc = bhc + dhc

    if transmissivity is not None:
        gh = ghc * transmissivity / clear_sky_transmissivity
        td, tt = separate_transmissivity_erbs_reindl(
            clear_sky_transmissivity, transmissivity, sun["elevation_refr"])
        dh = (td / jnp.maximum(tt, 1e-9)) * gh
    else:
        gh, dh = ghc, dhc

    sunlit = illuminated & ~shadow & (sun["incidence"] > 0.0)
    bh = jnp.where(sunlit, gh - dh, 0.0)
    gh = jnp.where(sunlit, gh, dh)

    flat = slope_deg < 1e-6
    beam = jnp.where(flat, bh, jnp.where(sunlit, beam_inclined(bh, sun), 0.0))
    diffuse = jnp.where(flat, dh,
                        diffuse_inclined_muneer(bh, dh, sun, slope_deg,
                                                aspect_deg, shadow))
    reflected = jnp.where(flat, 0.0,
                          reflected_irradiance(bh, dh, albedo, slope_deg))
    glob = beam + diffuse + reflected

    dark = ~illuminated
    zero = jnp.zeros_like(beam)
    beam = jnp.where(dark | ~valid, zero, beam)
    diffuse = jnp.where(dark | ~valid, zero, diffuse)
    reflected = jnp.where(dark | ~valid, zero, reflected)
    glob = jnp.where(dark | ~valid, zero, glob)

    return RadiationOutput(global_irr=glob, beam=beam, diffuse=diffuse,
                           reflected=reflected, sun=sun)
