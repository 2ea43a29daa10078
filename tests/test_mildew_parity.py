"""Parity: grapevine disease models vs the compiled reference
(src/grapevine/downyMildew.cpp, powderyMildew.cpp).

Season-long trajectories under synthetic spring weather; the downy model's
cohort bookkeeping (our fixed slot pool vs the reference's dynamic vector)
is compared on the shared scalar state and the infection/oil-spot events.
"""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import criteria3d_tpu  # noqa: F401
from criteria3d_tpu.physics.downy_mildew import (DownyMildewInput,
                                                 DownyMildewState,
                                                 downy_mildew_step)
from criteria3d_tpu.physics.powdery_mildew import (PowderyMildewState,
                                                   powdery_mildew_step)

GOLDEN = Path(__file__).parent / "golden"
BUILD = Path("/tmp/refgrape")
RUNNER = BUILD / "mildew_runner"


@pytest.fixture(scope="module")
def runner():
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    if not RUNNER.exists():
        subprocess.run(["bash", str(GOLDEN / "build_grapevine.sh"),
                        str(BUILD)], check=True, capture_output=True)
    return RUNNER


def run_oracle(runner, mode, rows):
    head = f"{mode} {len(rows)}"
    body = "\n".join(f"{t!r} {r!r} {w} {rh!r} {f}"
                     for (t, r, w, rh, f) in rows)
    res = subprocess.run([str(runner)], input=head + "\n" + body + "\n",
                         capture_output=True, text=True, check=True)
    return np.array([[float(v) for v in line.split()]
                     for line in res.stdout.splitlines()])


def spring_hours(seed, n=24 * 90):
    """Synthetic March-May hourly weather: warming diurnal cycle with
    rain episodes (the downy germination season)."""
    rng = np.random.default_rng(seed)
    rows = []
    raining = 0
    for h in range(n):
        day = h // 24
        t = 8.0 + day * 0.12 + 6.0 * np.sin((h % 24 - 9) / 24.0 * 2 * np.pi) \
            + float(rng.normal(0, 1.0))
        if raining == 0 and rng.random() < 0.02:
            raining = int(rng.integers(3, 12))
        rain = float(rng.uniform(0.3, 4.0)) if raining > 0 else 0.0
        raining = max(raining - 1, 0)
        rh = min(98.0, 70.0 + (25.0 if rain > 0 else 0.0)
                 + float(rng.normal(0, 6.0)))
        wet = 1 if (rain > 0 or rh > 92.0) else 0
        rows.append((round(float(t), 3), round(float(rain), 3), wet,
                     round(float(max(rh, 30.0)), 3), 1 if h == 0 else 0))
    return rows


@pytest.mark.parametrize("seed", [1, 5])
def test_downy_mildew_season(runner, seed):
    rows = spring_hours(seed)
    ref = run_oracle(runner, "DOWNY", rows)

    state = DownyMildewState.initialize((), jnp.float32)
    ours = []
    for (t, r, w, rh, first) in rows:
        state, out = downy_mildew_step(
            state, DownyMildewInput(tair=t, rain=r, leaf_wetness=w,
                                    relative_humidity=rh),
            is_first_january=bool(first))
        ours.append([float(state.htt), float(state.current_pmo),
                     float(out["mmo"]), float(out["is_infection"]),
                     float(out["oil_spots"])])
    ours = np.array(ours)

    # hydrothermal time + oospore pools are scalar recurrences: tight
    np.testing.assert_allclose(ours[:, 0], ref[:, 0], rtol=1e-5, atol=1e-6,
                               err_msg=f"seed {seed}: htt")
    np.testing.assert_allclose(ours[:, 1], ref[:, 1], rtol=1e-4, atol=1e-6,
                               err_msg=f"seed {seed}: currentPmo")
    np.testing.assert_allclose(ours[:, 2], ref[:, 2], rtol=1e-4, atol=1e-6,
                               err_msg=f"seed {seed}: mmo")
    # infection events: same hours flag infections
    np.testing.assert_array_equal(ours[:, 3] > 0, ref[:, 3] > 0,
                                  err_msg=f"seed {seed}: infection hours")
    # oil spots accumulate within a tight envelope of the cohort mass
    np.testing.assert_allclose(ours[:, 4].cumsum(), ref[:, 4].cumsum(),
                               rtol=1e-3, atol=1e-6,
                               err_msg=f"seed {seed}: oil spots")
    # the season actually produced disease activity
    assert ref[:, 0].max() > 1.3


@pytest.mark.parametrize("seed", [2, 9])
def test_powdery_mildew_season(runner, seed):
    rng = np.random.default_rng(seed)
    rows = []
    for d in range(150):
        t = 10.0 + d * 0.1 + float(rng.normal(0, 2.0))
        rain = float(rng.choice([0.0, 0.0, 0.0, rng.uniform(0.5, 15.0)]))
        rh = min(98.0, 65.0 + (20.0 if rain > 0 else 0.0)
                 + float(rng.normal(0, 8.0)))
        wet = 1 if (rain > 0 or rh > 90.0) else 0
        rows.append((round(float(t), 3), round(float(rain), 3), wet,
                     round(float(max(rh, 30.0)), 3), 1 if d == 0 else 0))
    ref = run_oracle(runner, "POWDERY", rows)

    state = PowderyMildewState.initialize((), jnp.float32)
    ours = []
    for (t, r, w, rh, first) in rows:
        state, out = powdery_mildew_step(
            state, tavg=t, rain=r, leaf_wetness=w, relative_humidity=rh,
            is_bud_break=bool(first))
        ours.append([float(state.degree_days), float(state.aic),
                     float(state.current_colonies),
                     float(state.total_sporulating),
                     float(out["infection_rate"]),
                     float(out["infection_risk"]),
                     float(out["aol"]), float(out["col"])])
    ours = np.array(ours)

    # the reference mixes float state with double intermediates
    # (vapourPressureDeficit returns double, state is float), so the
    # recurrent pools carry a few 1e-4 of mixed-rounding drift
    for col, ref_col, name, rtol in [(0, 0, "degreeDays", 1e-6),
                                     (1, 1, "aic", 1e-3),
                                     (2, 2, "currentColonies", 1e-3),
                                     (3, 3, "totalSporulating", 1e-3),
                                     (4, 6, "infectionRate", 5e-3),
                                     (5, 7, "infectionRisk", 5e-3),
                                     (6, 8, "aol", 1e-3),
                                     (7, 9, "col", 5e-3)]:
        np.testing.assert_allclose(ours[:, col], ref[:, ref_col],
                                   rtol=rtol, atol=1e-7,
                                   err_msg=f"seed {seed}: {name}")
    assert ref[:, 3].max() > 0      # sporulation happened


def test_canopy_interception_parity(runner):
    """Canopy water balance vs the compiled waterManagementCanopy
    (rainfallInterception.cpp:75-116), randomized step draws + a wet-dry
    sequence carrying the stored water through."""
    from criteria3d_tpu.physics.interception import canopy_water_management

    rng = np.random.default_rng(17)
    rows = []
    stored = 0.0
    seq = []
    for k in range(40):
        rain = float(rng.choice([0.0, 0.0, rng.uniform(0.1, 12.0)]))
        ev = float(rng.uniform(0.0, 0.5))
        lai = float(rng.uniform(0.3, 6.0))
        seq.append((stored, rain, ev, lai))
        rows.append((stored, rain, ev, lai, 0.2, 0.6, 0.2, 0.5, 0.15))
        stored = None  # chained below

    # chain: feed each step's reference stored water into the next row
    out_rows = []
    st = 0.0
    for k in range(40):
        _, rain, ev, lai = seq[k]
        row = (st, rain, ev, lai, 0.2, 0.6, 0.2, 0.5, 0.15)
        head = "INTERCEPT 1"
        body = " ".join(repr(float(v)) for v in row)
        res = subprocess.run([str(BUILD / "mildew_runner")],
                             input=head + "\n" + body + "\n",
                             capture_output=True, text=True, check=True)
        vals = [float(v) for v in res.stdout.split()]
        out_rows.append((row, vals))
        st = vals[0]

    st_ours = 0.0
    for (row, ref_vals) in out_rows:
        stored0, rain, ev, lai = row[0], row[1], row[2], row[3]
        assert abs(st_ours - stored0) < 1e-9   # chained identically
        out = canopy_water_management(jnp.asarray(st_ours), rain, ev, lai,
                                      lai_min=0.2,
                                      extinction_coefficient=0.6,
                                      leaf_storage=0.2, stem_storage=0.5,
                                      max_stem_flow_rate=0.15)
        for key, idx in (("stored_water", 0), ("free_rainfall", 1),
                         ("drainage", 2), ("stem_flow", 3),
                         ("throughfall", 4), ("soil_water", 5)):
            assert abs(float(out[key]) - ref_vals[idx]) < 1e-9, \
                (key, row, float(out[key]), ref_vals[idx])
        st_ours = float(out["stored_water"])
