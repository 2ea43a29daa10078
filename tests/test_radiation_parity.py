"""Reference-parity oracle for the solar-radiation stack.

The UNMODIFIED agrolib/solarRadiation library (SOLPOS sun position, Linke
clear-sky, Erbs-Reindl split, Muneer inclined diffuse, DEM ray-march
shadowing) is compiled as a golden runner (tests/golden/radiation_runner)
and driven over a synthetic hilly DEM; our whole-map
compute_radiation_dem must reproduce its per-cell irradiance using the
oracle's own lat/lon/slope/aspect maps as inputs.
"""

import os
import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
BUILD = "/tmp/refrad"
RUNNER = os.path.join(BUILD, "radiation_runner")

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/agrolib/solarRadiation"),
    reason="reference sources not available")


@pytest.fixture(scope="module")
def runner():
    if not os.path.exists(RUNNER):
        subprocess.run(["sh", os.path.join(HERE, "golden",
                                           "build_radiation.sh"), BUILD],
                       check=True, capture_output=True, timeout=600)
    return RUNNER


@pytest.fixture(scope="module")
def dem():
    R, C = 24, 20
    rows, cols = np.mgrid[0:R, 0:C]
    z = 400.0 + 120.0 * np.sin(rows / 5.0) + 90.0 * np.cos(cols / 4.0) \
        + 2.0 * rows
    z[0, 0] = z[5, 7] = -9999.0          # nodata holes
    return z


def run_oracle(runner, dem, *, when, linke=3.5, albedo=0.2, clear_sky=0.75,
               transmissivity=0.75, real_sky=0, shadowing=1,
               cellsize=50.0, xll=680000.0, yll=4950000.0, utm_zone=32,
               timezone=1):
    R, C = dem.shape
    year, month, day, hour, minute = when
    lines = [f"{R} {C} {cellsize} {xll} {yll} -9999 {utm_zone} {timezone} 0",
             f"{year} {month} {day} {hour} {minute}",
             f"{linke} {albedo} {clear_sky} {transmissivity} "
             f"{real_sky} {shadowing}"]
    lines += [" ".join(f"{v:.3f}" for v in row) for row in dem]
    out = subprocess.run([runner], input="\n".join(lines) + "\n",
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    fields = ["lat", "lon", "slope", "aspect", "elev", "global", "beam",
              "diffuse", "reflected"]
    maps = {k: np.full(dem.shape, np.nan) for k in fields}
    for line in out.stdout.splitlines():
        parts = line.split()
        r, c = int(parts[0]), int(parts[1])
        for k, v in zip(fields, parts[2:]):
            maps[k][r, c] = float(v)
    return maps


def run_ours(dem, oracle, *, when, linke=3.5, albedo=0.2, clear_sky=0.75,
             transmissivity=None, cellsize=50.0, timezone=1):
    # transmissivity=None -> clear-sky Linke branch (realSky=0 in the
    # oracle); a map selects the real-sky Gh = Ghc*T/Tcs scaling
    from criteria3d_tpu.physics.radiation import compute_radiation_dem

    valid = ~np.isclose(dem, -9999.0)
    year, month, day, hour, _ = when
    rad = compute_radiation_dem(
        jnp.asarray(np.where(valid, dem, 0.0)), jnp.asarray(valid),
        cellsize,
        jnp.asarray(np.where(valid, oracle["lat"], 44.7)),
        jnp.asarray(np.where(valid, oracle["lon"], 11.0)),
        jnp.asarray(np.where(valid, oracle["slope"], 0.0)),
        jnp.asarray(np.where(valid, oracle["aspect"], 0.0)),
        timezone, year, month, day, hour,
        linke=linke, albedo=albedo,
        clear_sky_transmissivity=clear_sky,
        transmissivity=None if transmissivity is None
        else jnp.full(dem.shape, transmissivity))
    return rad, valid


def _compare(oracle, rad, valid, *, rtol=5e-3, atol=3.0, max_bad=0.02):
    ours = {"global": np.asarray(rad.global_irr),
            "beam": np.asarray(rad.beam),
            "diffuse": np.asarray(rad.diffuse),
            "reflected": np.asarray(rad.reflected)}
    for key in ours:
        ref = oracle[key][valid]
        got = ours[key][valid]
        err = np.abs(got - ref)
        tol = atol + rtol * np.abs(ref)
        frac_bad = (err > tol).mean()
        assert frac_bad <= max_bad, \
            f"{key}: {frac_bad:.1%} cells beyond tolerance " \
            f"(max err {err.max():.2f} W/m2)"


def test_clear_sky_noon(runner, dem):
    when = (2023, 6, 15, 12, 0)
    oracle = run_oracle(runner, dem, when=when)
    rad, valid = run_ours(dem, oracle, when=when)
    # sun elevation within a tenth of a degree everywhere
    elev = np.asarray(rad.sun["elevation_refr"])
    d_elev = np.abs(elev[valid] - oracle["elev"][valid])
    assert d_elev.max() < 0.1
    _compare(oracle, rad, valid)
    # plausibility anchor: midsummer noon global ~ 700-1000 W/m2
    assert 600 < np.nanmean(oracle["global"]) < 1100


def test_low_sun_with_shadows(runner, dem):
    when = (2023, 1, 20, 9, 0)
    oracle = run_oracle(runner, dem, when=when)
    rad, valid = run_ours(dem, oracle, when=when)
    # discrete ray-march: allow a few boundary cells to disagree
    _compare(oracle, rad, valid, max_bad=0.06)
    # shadows genuinely present: some illuminated cells, some zero-beam
    b = oracle["beam"][valid]
    assert (b > 1.0).any() and (b < 0.5).any()


def test_real_sky_afternoon(runner, dem):
    when = (2023, 9, 1, 15, 0)
    oracle = run_oracle(runner, dem, when=when, real_sky=1,
                        transmissivity=0.45)
    rad, valid = run_ours(dem, oracle, when=when, transmissivity=0.45)
    _compare(oracle, rad, valid)


def test_night_is_dark(runner, dem):
    when = (2023, 6, 15, 1, 0)
    oracle = run_oracle(runner, dem, when=when)
    rad, valid = run_ours(dem, oracle, when=when)
    assert np.nanmax(oracle["global"]) == 0.0
    assert float(jnp.max(rad.global_irr)) == 0.0
