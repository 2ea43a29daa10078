"""Radiation stack tests: sun position sanity, clear-sky energy, shadowing, UTM."""

import numpy as np
import jax.numpy as jnp
import pytest

from criteria3d_tpu.core.geo import latlon_to_utm, utm_to_latlon
from criteria3d_tpu.physics.radiation import (clear_sky_beam_horizontal,
                                              clear_sky_diffuse_horizontal,
                                              compute_radiation_dem,
                                              separate_transmissivity_erbs_reindl,
                                              shadow_map, sun_position)


def test_sun_position_equinox_noon():
    """At the March equinox, solar-noon elevation ~= 90 - |latitude|."""
    sun = sun_position(45.0, 0.0, 0, 2023, 3, 21, 12, 7)  # ~solar noon at lon 0
    assert float(sun["elevation"]) == pytest.approx(45.0, abs=1.0)
    assert float(sun["azimuth"]) == pytest.approx(180.0, abs=3.0)
    # horizontal extraterrestrial = normal * cos(zenith)
    assert float(sun["etr_horizontal"]) <= float(sun["etr_normal"])


def test_sun_position_solstice():
    sun_jun = sun_position(44.5, 11.3, 1, 2023, 6, 21, 13, 0)
    sun_dec = sun_position(44.5, 11.3, 1, 2023, 12, 21, 12, 0)
    # summer noon sun much higher than winter
    assert float(sun_jun["elevation"]) > 65.0
    assert float(sun_dec["elevation"]) < 25.0
    # sunrise before sunset, both within the day
    assert 0 < float(sun_jun["sunrise_s"]) < float(sun_jun["sunset_s"]) < 86400


def test_sun_position_night():
    sun = sun_position(44.5, 11.3, 1, 2023, 6, 21, 1, 0)
    assert float(sun["elevation"]) < 0
    assert float(sun["etr_horizontal"]) == 0.0


def test_clear_sky_plausible_magnitudes():
    sun = sun_position(44.5, 11.3, 1, 2023, 6, 21, 13, 0)
    bh = float(clear_sky_beam_horizontal(3.5, sun))
    dh = float(clear_sky_diffuse_horizontal(3.5, sun))
    # mid-summer clear-sky at 44N: beam 600-950, diffuse 80-200 W/m2
    assert 600 < bh < 1000
    assert 50 < dh < 250
    # higher turbidity -> less beam, more diffuse
    assert float(clear_sky_beam_horizontal(6.0, sun)) < bh
    assert float(clear_sky_diffuse_horizontal(6.0, sun)) > dh


def test_erbs_reindl_bounds():
    td, tt = separate_transmissivity_erbs_reindl(0.75, 0.75, 45.0)
    assert 0 < float(td) < float(tt) <= 0.75
    # overcast: nearly all diffuse
    td2, tt2 = separate_transmissivity_erbs_reindl(0.75, 0.12, 45.0)
    assert float(td2) / float(tt2) > 0.8


def test_shadow_map_cliff():
    """A wall on the sun side shadows cells behind it."""
    dem = np.zeros((20, 20))
    dem[:, 10] = 50.0   # north-south wall
    valid = np.ones((20, 20), bool)
    # sun low in the east (azimuth 90): cells west of the wall are shadowed
    sh = np.asarray(shadow_map(jnp.asarray(dem), jnp.asarray(valid), 10.0,
                               azimuth_deg=90.0, elevation_deg=10.0))
    assert sh[10, 5]          # west of wall: shadowed
    assert not sh[10, 15]     # east of wall (sun side): lit
    # sun high: nothing shadowed
    sh_hi = np.asarray(shadow_map(jnp.asarray(dem), jnp.asarray(valid), 10.0,
                                  azimuth_deg=90.0, elevation_deg=80.0))
    assert not sh_hi[10, 5]


def test_compute_radiation_dem_daynight():
    dem = np.full((8, 8), 200.0)
    valid = np.ones((8, 8), bool)
    lat = np.full((8, 8), 44.5)
    lon = np.full((8, 8), 11.3)
    zeros = np.zeros((8, 8))
    day = compute_radiation_dem(jnp.asarray(dem), jnp.asarray(valid), 10.0,
                                lat, lon, zeros, zeros, 1, 2023, 6, 21, 12)
    night = compute_radiation_dem(jnp.asarray(dem), jnp.asarray(valid), 10.0,
                                  lat, lon, zeros, zeros, 1, 2023, 6, 21, 0)
    assert float(day.global_irr[4, 4]) > 500.0
    assert float(night.global_irr[4, 4]) == 0.0
    # flat terrain: no reflected component
    assert float(day.reflected[4, 4]) == 0.0


def test_utm_latlon_roundtrip():
    lat, lon = 44.5123, 11.3456
    e, n, zone = latlon_to_utm(lat, lon)
    lat2, lon2 = utm_to_latlon(zone, lat, e, n)
    assert float(lat2) == pytest.approx(lat, abs=1e-6)
    assert float(lon2) == pytest.approx(lon, abs=1e-6)
    # Ravone DEM corner (zone 32) lands near Bologna
    lat3, lon3 = utm_to_latlon(32, 44.0, 682648.0, 4923526.0)
    assert 44.0 < lat3 < 45.0 and 11.0 < lon3 < 12.0


def test_transmissivity_estimation():
    from criteria3d_tpu.physics.radiation import (transmissivity_samani,
                                                  transmissivity_from_measured)
    # Samani: larger T range -> more transmissive
    t1 = float(transmissivity_samani(10.0, 20.0))
    t2 = float(transmissivity_samani(10.0, 14.0))
    assert t1 > t2 > 0

    # measured / potential ratio scaled by clear-sky
    obs = jnp.asarray([300.0, 400.0, 350.0])
    pot = jnp.asarray([600.0, 800.0, 700.0])
    t = float(transmissivity_from_measured(obs, pot, 0.75))
    assert t == pytest.approx(0.75 * 0.5)

    # too many gaps -> NODATA
    obs_gap = jnp.asarray([300.0, -9999.0, -9999.0])
    assert float(transmissivity_from_measured(obs_gap, pot)) == -9999.0
