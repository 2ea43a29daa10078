"""Soil physics unit tests.

Oracle: direct re-evaluation of the reference formulas
(agrolib/soilFluxes3D/soilPhysics.cpp) at scalar points with plain Python
floats — independent of the jnp implementation under test.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from criteria3d_tpu.core.soil import (MeanType, SoilFields, WRCModel,
                                      compute_mean, dtheta_dh,
                                      mualem_conductivity, psi_from_se,
                                      se_from_psi, theta_from_se)

# loam-like parameters (DATA/SOIL style)
ALPHA, N, HE = 1.0, 1.4, 0.02   # [m-1], [-], [m]
M = 1 - 1 / N
SC = (1 + (ALPHA * HE) ** N) ** (-M)
THETA_S, THETA_R, KSAT, L = 0.43, 0.05, 1e-5, 0.5


@pytest.fixture
def soil():
    return SoilFields.uniform((4, 4), vg_alpha=ALPHA, vg_n=N, vg_he=HE,
                              theta_s=THETA_S, theta_r=THETA_R, k_sat=KSAT,
                              mualem_l=L)


def ref_se_vg(psi):
    return (1.0 + (ALPHA * psi) ** N) ** (-M)


def ref_se_mvg(psi):
    if psi <= HE:
        return 1.0
    return ref_se_vg(psi) / SC


def ref_mualem_mvg(se):
    if se >= 1.0:
        return KSAT
    inv_m = 1.0 / M
    num = 1.0 - (1.0 - (se * SC) ** inv_m) ** M
    den = 1.0 - (1.0 - SC ** inv_m) ** M
    return KSAT * se ** L * (num / den) ** 2


def test_se_from_psi_modified_vg(soil):
    for psi in [0.0, 0.01, 0.02, 0.05, 0.5, 5.0, 100.0]:
        got = float(se_from_psi(soil, jnp.full((4, 4), psi),
                                WRCModel.MODIFIED_VAN_GENUCHTEN)[0, 0])
        assert got == pytest.approx(ref_se_mvg(psi), rel=1e-14)


def test_se_from_psi_plain_vg(soil):
    for psi in [0.01, 1.0, 30.0]:
        got = float(se_from_psi(soil, jnp.full((4, 4), psi),
                                WRCModel.VAN_GENUCHTEN)[0, 0])
        assert got == pytest.approx(ref_se_vg(psi), rel=1e-14)


def test_psi_se_roundtrip(soil):
    for psi in [0.05, 0.7, 12.0]:
        se = se_from_psi(soil, jnp.full((4, 4), psi),
                         WRCModel.MODIFIED_VAN_GENUCHTEN)
        back = psi_from_se(soil, se, WRCModel.MODIFIED_VAN_GENUCHTEN)
        assert float(back[0, 0]) == pytest.approx(psi, rel=1e-10)


def test_theta_se_linear(soil):
    se = jnp.full((4, 4), 0.37)
    theta = theta_from_se(soil, se)
    assert float(theta[0, 0]) == pytest.approx(0.37 * (THETA_S - THETA_R) + THETA_R)


def test_mualem_conductivity(soil):
    for se in [0.05, 0.3, 0.8, 0.999, 1.0]:
        got = float(mualem_conductivity(soil, jnp.full((4, 4), se),
                                        WRCModel.MODIFIED_VAN_GENUCHTEN)[0, 0])
        assert got == pytest.approx(ref_mualem_mvg(se), rel=1e-12)
    # monotone increasing in Se
    ks = [float(mualem_conductivity(soil, jnp.full((1, 1), s),
                                    WRCModel.MODIFIED_VAN_GENUCHTEN)[0, 0])
          for s in np.linspace(0.05, 1.0, 20)]
    assert all(a < b for a, b in zip(ks, ks[1:]))


def test_dtheta_dh_analytic_vs_secant(soil):
    z = jnp.zeros((4, 4))
    # analytic branch: h == h_old, unsaturated
    h = jnp.full((4, 4), -1.0)
    cap = float(dtheta_dh(soil, h, h, z, WRCModel.MODIFIED_VAN_GENUCHTEN)[0, 0])
    psi = 1.0
    x = ALPHA * psi
    dse = ALPHA * N * M * (1 + x ** N) ** (-(M + 1)) * x ** (N - 1) / SC
    assert cap == pytest.approx(dse * (THETA_S - THETA_R), rel=1e-12)

    # secant branch matches chord of the retention curve
    h_old = jnp.full((4, 4), -2.0)
    cap_sec = float(dtheta_dh(soil, h, h_old, z,
                              WRCModel.MODIFIED_VAN_GENUCHTEN)[0, 0])
    chord = abs(ref_se_mvg(1.0) - ref_se_mvg(2.0)) / 1.0 * (THETA_S - THETA_R)
    assert cap_sec == pytest.approx(chord, rel=1e-12)

    # saturation early-out (both below air entry)
    h_sat = jnp.full((4, 4), 0.5)
    assert float(dtheta_dh(soil, h_sat, h_sat, z,
                           WRCModel.MODIFIED_VAN_GENUCHTEN)[0, 0]) == 0.0


def test_compute_mean():
    a, b = jnp.asarray(1e-7), jnp.asarray(1e-5)
    log_mean = float(compute_mean(a, b, MeanType.LOGARITHMIC))
    assert log_mean == pytest.approx((1e-7 - 1e-5) / math.log(1e-7 / 1e-5), rel=1e-14)
    assert float(compute_mean(a, a, MeanType.LOGARITHMIC)) == pytest.approx(1e-7)
    assert float(compute_mean(a, b, MeanType.ARITHMETIC)) == pytest.approx(5.05e-6)
    assert float(compute_mean(a, b, MeanType.GEOMETRIC)) == pytest.approx(1e-6)


def test_log_mean_near_equal_conditioning():
    """The log-mean must stay exact for conductivities differing by a few
    ulp — the generic state of a quiescent uniform region. The reference's
    naive `(k1-k2)/log(k1/k2)` (otherFunctions.cpp:33-36, guarded only by
    exact equality) suffers catastrophic cancellation there: measured
    -17.9% / +9.5% error and row asymmetry on a real 3-ulp pair, producing
    spurious head jumps in static dry columns (upstream bug, DEVIATIONS
    #23). Our log1p form is uniformly accurate for ALL ratios."""
    import numpy as np

    k = 2.1264732321154394e-10
    for n_ulp in (1, 2, 3, 7):
        k2 = k
        for _ in range(n_ulp):
            k2 = np.nextafter(k2, 0.0)
        # ours: exact to ~1 ulp (for d ~ 1e-16 the log-mean equals the
        # arithmetic mean to O(d^2))
        ours = float(compute_mean(jnp.float64(k), jnp.float64(k2),
                                  MeanType.LOGARITHMIC))
        true = 0.5 * (k + k2)
        assert abs(ours - true) / true < 1e-13, (n_ulp, ours, true)
        # the reference's naive form is off by >5% for at least one of
        # these pairs (the blow-up depends on how the ratio rounds)
    naive_errs = []
    for n_ulp in (1, 2, 3, 7):
        k2 = k
        for _ in range(n_ulp):
            k2 = np.nextafter(k2, 0.0)
        naive = (k - k2) / np.log(k / k2)
        naive_errs.append(abs(naive - 0.5 * (k + k2)) / (0.5 * (k + k2)))
    assert max(naive_errs) > 0.05, naive_errs
