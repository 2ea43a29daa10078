"""Interpolation parity vs the REFERENCE agrolib/interpolation library.

Second golden oracle (VERDICT round-1 item 7): the unmodified reference
interpolation stack (interpolation.cpp + meteo + gis + mathFunctions — no Qt
anywhere in the chain) is compiled by tests/golden/build_interpolation.sh and
driven over synthetic station sets; our detrended IDW / Shepard maps must
agree at the same target locations.

Reference path exercised: preInterpolation -> detrending (regressionOrography
simple branch, thermal inversion off) -> interpolate -> IDW/Shepard +
retrend (interpolation.cpp:1380-1415, 2444-2560).
"""

import os
import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

from criteria3d_tpu.constants import NODATA
from criteria3d_tpu.physics.interpolation import (VariableKind, detrended_idw,
                                                  shepard_idw_map)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
BUILD_DIR = "/tmp/refinterp"
RUNNER = os.path.join(BUILD_DIR, "interpolation_runner")
REF_AVAILABLE = os.path.exists("/root/reference/agrolib/interpolation")


def ensure_runner():
    src = os.path.join(GOLDEN_DIR, "interpolation_runner.cpp")
    if os.path.exists(RUNNER) and \
            os.path.getmtime(RUNNER) >= os.path.getmtime(src):
        return True
    if not REF_AVAILABLE:
        return False
    r = subprocess.run(
        [os.path.join(GOLDEN_DIR, "build_interpolation.sh"), BUILD_DIR],
        capture_output=True, text=True)
    return r.returncode == 0 and os.path.exists(RUNNER)


# hillside station network: strong elevation signal + noise
STATIONS = np.array([
    # x, y, z, T value
    [500.0, 500.0, 100.0, 15.2],
    [3200.0, 900.0, 350.0, 13.0],
    [1500.0, 2800.0, 220.0, 14.1],
    [2800.0, 2500.0, 500.0, 12.3],
    [700.0, 1700.0, 150.0, 14.9],
    [2000.0, 1200.0, 280.0, 13.6],
    [1200.0, 2200.0, 180.0, 14.55],
    [2400.0, 600.0, 420.0, 12.75],
])

TARGETS = np.array([
    [1000.0, 1000.0, 120.0],
    [2500.0, 2000.0, 400.0],
    [1800.0, 700.0, 250.0],
    [3000.0, 2900.0, 480.0],
    [600.0, 2600.0, 140.0],
    [2100.0, 1600.0, 310.0],
])


def run_oracle(algo, use_detrending, var, values, tmp_path,
               min_r2=0.1, prec_threshold=0.2):
    path = str(tmp_path / "interp_in.txt")
    with open(path, "w") as f:
        f.write(f"SETTINGS {algo} {int(use_detrending)} {min_r2} "
                f"{prec_threshold}\n")
        f.write(f"VAR {var}\n")
        f.write(f"STATIONS {len(STATIONS)}\n")
        for (x, y, z, _), v in zip(STATIONS, values):
            f.write(f"{x} {y} {z} {v}\n")
        f.write(f"TARGETS {len(TARGETS)}\n")
        for x, y, z in TARGETS:
            f.write(f"{x} {y} {z}\n")
    r = subprocess.run([RUNNER, path], capture_output=True, text=True,
                       timeout=120)
    assert r.returncode == 0, r.stderr
    lines = r.stdout.strip().splitlines()
    vals = np.array([float(s) for s in lines[:len(TARGETS)]])
    reg = None
    if lines and lines[len(TARGETS):]:
        parts = lines[len(TARGETS)].split()
        reg = dict(r2=float(parts[1]), slope=float(parts[2]))
    return vals, reg


@pytest.mark.skipif(not REF_AVAILABLE, reason="reference tree not mounted")
class TestInterpolationParity:

    @classmethod
    def setup_class(cls):
        if not ensure_runner():
            pytest.skip("reference interpolation build failed")

    def _ours_idw(self, values, kind, **kw):
        out, proxy = detrended_idw(
            STATIONS[:, 0], STATIONS[:, 1], STATIONS[:, 2],
            np.asarray(values),
            jnp.asarray(TARGETS[:, 0]), jnp.asarray(TARGETS[:, 1]),
            jnp.asarray(TARGETS[:, 2]), kind=kind, **kw)
        return np.asarray(out), proxy

    def test_detrended_idw_temperature(self, tmp_path):
        """Elevation-detrended IDW of temperature: the headline path
        (interpolationDemMain equivalent)."""
        values = STATIONS[:, 3]
        ref, reg = run_oracle("idw", True, "airTemperature", values, tmp_path)
        ours, proxy = self._ours_idw(values, VariableKind.TEMPERATURE)
        # reference runs in float32; sub-0.01 degC agreement expected
        np.testing.assert_allclose(ours, ref, atol=2e-3)
        # the fitted lapse rate agrees too
        assert float(proxy.slope) == pytest.approx(reg["slope"], rel=1e-3)
        assert float(proxy.r2) == pytest.approx(reg["r2"], rel=1e-3)

    def test_plain_idw_no_detrending(self, tmp_path):
        values = STATIONS[:, 3]
        ref, _ = run_oracle("idw", False, "airTemperature", values, tmp_path)
        ours, _ = self._ours_idw(values, VariableKind.GENERIC,
                                 min_regression_r2=2.0)   # force no detrend
        np.testing.assert_allclose(ours, ref, atol=2e-3)

    def test_precipitation_threshold(self, tmp_path):
        """Precipitation: no detrending, sub-threshold clipped to zero."""
        prec = np.array([0.0, 2.4, 0.1, 5.0, 0.0, 1.2, 0.15, 3.3])
        ref, _ = run_oracle("idw", True, "precipitation", prec, tmp_path)
        ours, _ = self._ours_idw(prec, VariableKind.PRECIPITATION)
        np.testing.assert_allclose(ours, ref, atol=2e-3)

    def test_precipitation_all_zero(self, tmp_path):
        prec = np.zeros(len(STATIONS))
        ref, _ = run_oracle("idw", True, "precipitation", prec, tmp_path)
        ours, _ = self._ours_idw(prec, VariableKind.PRECIPITATION)
        np.testing.assert_allclose(ours, ref, atol=1e-9)
        assert (ours == 0).all()

    def test_shepard(self, tmp_path):
        """Classic Shepard with directional factors, no detrending."""
        values = STATIONS[:, 3]
        ref, _ = run_oracle("shepard", False, "airTemperature", values,
                            tmp_path)
        ours = np.asarray(shepard_idw_map(
            STATIONS[:, 0], STATIONS[:, 1], values,
            jnp.asarray(TARGETS[:, 0]), jnp.asarray(TARGETS[:, 1])))
        np.testing.assert_allclose(ours, ref, atol=5e-3)

    def test_missing_station_values(self, tmp_path):
        """NODATA stations are excluded on both sides."""
        values = STATIONS[:, 3].copy()
        values[2] = NODATA
        values[5] = NODATA
        ref, _ = run_oracle("idw", True, "airTemperature", values, tmp_path)
        ours, _ = self._ours_idw(values, VariableKind.TEMPERATURE)
        np.testing.assert_allclose(ours, ref, atol=2e-3)
