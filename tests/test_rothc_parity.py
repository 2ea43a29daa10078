"""Parity: RothC pools vs the compiled reference (src/rothCplusplus).

24+ month trajectories and randomized draws against the unmodified
reference sources (VERDICT round-3 missing #2: replace behavioral-only
tests with a compiled-oracle bar).
"""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import criteria3d_tpu  # noqa: F401
from criteria3d_tpu.physics.rothc import RothCState, rothc_monthly_step

GOLDEN = Path(__file__).parent / "golden"
BUILD = Path("/tmp/refrothc")
RUNNER = BUILD / "rothc_runner"

# the reference hardcodes farmyard manure at 0.4 kgC/day/ha * 0.03
# (computeRothCPoint, rothCplusplus.cpp:297-299)
FYM = 0.4 * 0.03


@pytest.fixture(scope="module")
def runner():
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    if not RUNNER.exists():
        subprocess.run(["bash", str(GOLDEN / "build_rothc.sh"), str(BUILD)],
                       check=True, capture_output=True)
    return RUNNER


def run_oracle(runner, clay, depth, swc, pools, months):
    head = (f"{clay} {depth} {swc} {pools[0]} {pools[1]} {pools[2]} "
            f"{pools[3]} {pools[4]} {len(months)}")
    body = "\n".join(" ".join(repr(float(v)) for v in m) for m in months)
    res = subprocess.run([str(runner)], input=head + "\n" + body + "\n",
                         capture_output=True, text=True, check=True)
    return np.array([[float(v) for v in line.split()]
                     for line in res.stdout.splitlines()])


def run_ours(clay, depth, swc, pools, months):
    f = lambda v: jnp.asarray(float(v))
    state = RothCState(dpm=f(pools[0]), rpm=f(pools[1]), bio=f(pools[2]),
                       hum=f(pools[3]), iom=f(pools[4]), swc=f(swc))
    rows = []
    for (t, bic, cin, pc) in months:
        state, _ = rothc_monthly_step(
            state, temp_c=f(t), monthly_bic=f(bic), clay_pct=clay,
            depth_cm=depth, plant_cover=f(pc), carbon_input=f(cin),
            fym_input=FYM)
        rows.append([float(state.dpm), float(state.rpm), float(state.bio),
                     float(state.hum), float(state.iom), float(state.soc),
                     float(state.swc)])
    return np.array(rows)


EQ_POOLS = (0.14547, 5.67812, 0.74059, 27.64277, 3.0041)


def seasonal_months(n=24, litter=0.25):
    months = []
    for m in range(n):
        t = 12.0 + 10.0 * np.sin((m % 12 - 3) / 12.0 * 2 * np.pi)
        bic = 60.0 * np.cos((m % 12) / 12.0 * 2 * np.pi) - 20.0
        pc = 1.0 if 3 <= (m % 12) <= 9 else 0.0
        months.append((t, bic, litter if pc else 0.0, pc))
    return months


def test_two_year_seasonal_cycle(runner):
    months = seasonal_months(24)
    ref = run_oracle(runner, 30.0, 23.0, -5.0, EQ_POOLS, months)
    ours = run_ours(30.0, 23.0, -5.0, EQ_POOLS, months)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


def test_cold_dry_vs_warm_wet(runner):
    for clay, depth, months in [
            (10.0, 23.0, [(-8.0, -30.0, 0.0, 0.0)] * 12),
            (55.0, 40.0, [(25.0, 80.0, 0.5, 1.0)] * 12)]:
        ref = run_oracle(runner, clay, depth, 0.0, EQ_POOLS, months)
        ours = run_ours(clay, depth, 0.0, EQ_POOLS, months)
        np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


def test_randomized_draws(runner):
    rng = np.random.default_rng(3)
    for _ in range(10):
        clay = float(rng.uniform(5.0, 60.0))
        depth = float(rng.uniform(15.0, 50.0))
        swc = float(rng.uniform(-30.0, 0.0))
        pools = tuple(rng.uniform(0.05, 30.0, 5))
        months = [(float(rng.uniform(-10.0, 30.0)),
                   float(rng.uniform(-80.0, 80.0)),
                   float(rng.uniform(0.0, 1.0)),
                   float(rng.choice([0.0, 1.0, rng.uniform(0, 1)])))
                  for _ in range(int(rng.integers(6, 30)))]
        ref = run_oracle(runner, clay, depth, swc, pools, months)
        ours = run_ours(clay, depth, swc, pools, months)
        np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)
