"""Parity: Brooks snowpack vs the compiled reference (src/snow/snow.cpp).

Trajectory-level comparison over storm / melt / albedo-aging sequences plus
randomized draws — replaces the behavioral-only snow tests as the
cross-implementation bar (VERDICT round-3, missing #2 / weak #5).
"""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import criteria3d_tpu  # noqa: F401
from criteria3d_tpu.constants import NODATA
from criteria3d_tpu.physics.snow import (SnowForcing, SnowParameters,
                                         SnowState, snow_step)

GOLDEN = Path(__file__).parent / "golden"
BUILD = Path("/tmp/refsnow")
RUNNER = BUILD / "snow_runner"

# reference soil-state initialisation at +5 C (SnowState.zero)
T0 = 5.0


@pytest.fixture(scope="module")
def runner():
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    if not RUNNER.exists():
        subprocess.run(["bash", str(GOLDEN / "build_snow.sh"), str(BUILD)],
                       check=True, capture_output=True)
    return RUNNER


def run_oracle(runner, forcing_rows, state0):
    head = (f"{state0['swe']} {state0['ice']} {state0['liquid']} "
            f"{state0['ie']} {state0['se']} {state0['st']} "
            f"{state0['age']} {len(forcing_rows)}")
    body = "\n".join(" ".join(repr(float(v)) for v in row)
                     for row in forcing_rows)
    res = subprocess.run([str(runner)], input=head + "\n" + body + "\n",
                         capture_output=True, text=True, check=True)
    return np.array([[float(v) for v in line.split()]
                     for line in res.stdout.splitlines()])


def run_ours(forcing_rows, state0):
    shape = (1, 1)
    f = lambda v: jnp.full(shape, float(v), jnp.float64)
    state = SnowState(swe=f(state0["swe"]), ice=f(state0["ice"]),
                      liquid=f(state0["liquid"]),
                      internal_energy=f(state0["ie"]),
                      surface_energy=f(state0["se"]),
                      surface_temp=f(state0["st"]), age=f(state0["age"]))
    rows = []
    for (t, p, rh, w, gr, br, tr, cst, wc) in forcing_rows:
        forcing = SnowForcing(
            air_temp=f(t), precipitation=f(p), rel_humidity=f(rh),
            wind_speed=f(w), global_radiation=f(gr), beam_radiation=f(br),
            transmissivity=f(tr), clear_sky_transmissivity=f(cst),
            surface_water=f(wc))
        state, out = snow_step(state, forcing)
        rows.append([float(jnp.ravel(x)[0]) for x in (
            state.swe, state.ice, state.liquid, state.internal_energy,
            state.surface_energy, state.surface_temp, state.age,
            out["snow_fall"], out["snow_melt"], out["evaporation"],
            out["sensible_heat"], out["latent_heat"])])
    return np.array(rows)


def initial_soil_state(t0=T0):
    """Bare-soil initial state as criteria3DProject initializes it."""
    from criteria3d_tpu.physics.snow import (DEFAULT_BULK_DENSITY,
                                             SOIL_DAMPING_DEPTH,
                                             SOIL_SPECIFIC_HEAT)
    ie = t0 * DEFAULT_BULK_DENSITY * SOIL_SPECIFIC_HEAT * SOIL_DAMPING_DEPTH
    se = t0 * DEFAULT_BULK_DENSITY * SOIL_SPECIFIC_HEAT * 0.02
    return dict(swe=0.0, ice=0.0, liquid=0.0, ie=ie, se=se, st=t0,
                age=NODATA)


def _compare(ref, ours, context=""):
    # state columns: swe ice liquid IE SE surfT age | fluxes
    np.testing.assert_allclose(ours[:, 0], ref[:, 0], rtol=1e-9, atol=5e-7,
                               err_msg=f"{context}: SWE")
    np.testing.assert_allclose(ours[:, 1], ref[:, 1], rtol=1e-9, atol=5e-7,
                               err_msg=f"{context}: ice")
    np.testing.assert_allclose(ours[:, 2], ref[:, 2], rtol=1e-9, atol=5e-7,
                               err_msg=f"{context}: liquid")
    np.testing.assert_allclose(ours[:, 3], ref[:, 3], rtol=1e-7, atol=1e-4,
                               err_msg=f"{context}: internal energy")
    np.testing.assert_allclose(ours[:, 5], ref[:, 5], rtol=1e-7, atol=1e-5,
                               err_msg=f"{context}: surface temp")
    np.testing.assert_allclose(ours[:, 6], ref[:, 6], rtol=1e-9, atol=1e-9,
                               err_msg=f"{context}: age")
    # getSnowMelt() clamps refreeze (negative melt) to 0 (snow.h:63)
    np.testing.assert_allclose(np.maximum(ours[:, 8], 0.0), ref[:, 8],
                               rtol=1e-9, atol=5e-7,
                               err_msg=f"{context}: melt")
    np.testing.assert_allclose(ours[:, 9], ref[:, 9], rtol=1e-7, atol=1e-9,
                               err_msg=f"{context}: evaporation")


def test_storm_trajectory(runner):
    """Cold multi-hour snowfall: accumulation + internal-energy descent."""
    rows = [(-4.0 - 0.5 * h, 2.5, 85.0, 3.0, 0.0, 0.0, 0.75, 0.75, 0.0)
            for h in range(12)]
    s0 = initial_soil_state()
    _compare(run_oracle(runner, rows, s0), run_ours(rows, s0), "storm")


def test_melt_trajectory(runner):
    """Build a pack, then melt it under warm sunny hours."""
    rows = [(-6.0, 4.0, 85.0, 2.0, 0.0, 0.0, 0.75, 0.75, 0.0)] * 8
    rows += [(8.0 + h, 0.0, 55.0, 2.0, 500.0, 350.0, 0.7, 0.75, 0.0)
             for h in range(10)]
    s0 = initial_soil_state(t0=0.0)
    ref, ours = run_oracle(runner, rows, s0), run_ours(rows, s0)
    _compare(ref, ours, "melt")
    assert ref[7, 0] > 10.0 and ref[-1, 0] < ref[7, 0]  # melted


def test_albedo_aging_trajectory(runner):
    """Dry clear cold days: age grows, albedo decays, pack sublimates."""
    rows = [(-8.0, 5.0, 90.0, 2.0, 0.0, 0.0, 0.75, 0.75, 0.0)] * 6
    for d in range(3):
        for h in range(24):
            sun = max(0.0, np.sin((h - 6) / 12.0 * np.pi))
            rows.append((-6.0 + 6.0 * sun, 0.0, 60.0, 1.5,
                         400.0 * sun, 280.0 * sun, 0.72, 0.75, 0.0))
    s0 = initial_soil_state(t0=-1.0)
    ref, ours = run_oracle(runner, rows, s0), run_ours(rows, s0)
    _compare(ref, ours, "aging")
    assert ref[-1, 6] > 2.0          # age advanced past two days


def test_randomized_hours(runner):
    rng = np.random.default_rng(7)
    for k in range(8):
        n = int(rng.integers(6, 30))
        t_base = float(rng.uniform(-12.0, 10.0))
        rows = []
        for h in range(n):
            sun = max(0.0, np.sin((h % 24 - 6) / 12.0 * np.pi))
            rows.append((
                t_base + float(rng.uniform(-3.0, 6.0)) * sun,
                float(rng.choice([0.0, 0.0, rng.uniform(0.1, 6.0)])),
                float(rng.uniform(40.0, 98.0)),
                float(rng.uniform(0.2, 8.0)),
                450.0 * sun, 300.0 * sun,
                float(rng.uniform(0.3, 0.75)), 0.75,
                float(rng.choice([0.0, 0.0, 0.0, rng.uniform(0.0, 3.0)]))))
        s0 = initial_soil_state(t0=float(rng.uniform(-2.0, 8.0)))
        _compare(run_oracle(runner, rows, s0), run_ours(rows, s0),
                 f"draw {k}")
