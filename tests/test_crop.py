"""Crop development / uptake tests, with the reference's discrete root
algorithm re-implemented in plain Python as the oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from criteria3d_tpu import Grid, SoilFields, SolverParameters
from criteria3d_tpu.physics import crop as C


def make_grid(n=4, depth=0.8):
    dem = np.full((n, n), 100.0)
    soil = SoilFields.uniform((n, n), vg_alpha=1.2, vg_n=1.5, vg_he=0.02,
                              theta_s=0.41, theta_r=0.04, k_sat=5e-6)
    return Grid.build(dem, 2.0, soil, total_depth=depth,
                      free_catchment_runoff=False, free_bottom_drainage=False,
                      free_lateral_drainage=False)


def reference_cardioid(shape_factor, n_rooted, n_unrooted, total):
    """Direct transcription of cardioidDistribution (root.cpp:255-318)."""
    out = np.zeros(total)
    if n_rooted == 0:
        return out
    shape_factor = min(max(shape_factor, 1.0), 2.0)
    lun = np.zeros(n_rooted)
    for i in range(n_rooted):
        sin_a = 1.0 - (i + 1.0) / n_rooted
        cos_a = max(np.sqrt(max(0.0, 1 - sin_a ** 2)), 1e-4)
        alfa = np.arctan2(sin_a, cos_a)
        lun[i] = (np.pi / 2 - alfa - sin_a * cos_a) / np.pi
    dens = np.zeros(2 * n_rooted)
    dens[0] = lun[0]
    dens[-1] = lun[0]
    for i in range(1, n_rooted):
        dens[i] = lun[i] - lun[i - 1]
        dens[2 * n_rooted - i - 1] = dens[i]
    li_min = -np.log(0.2) / n_rooted
    li_max = -np.log(0.05) / n_rooted
    k = li_min + (li_max - li_min) * (shape_factor - 1)
    dens *= np.exp(-k * (np.arange(2 * n_rooted) + 0.5))
    dens /= dens.sum()
    for i in range(n_rooted):
        out[n_unrooted + i] = dens[2 * i] + dens[2 * i + 1]
    return out


def test_lai_curve():
    crop = C.CropParameters()
    lai0 = float(C.lai_from_degree_days(crop, 0.0))
    lai_peak = float(C.lai_from_degree_days(crop, crop.degree_days_increase))
    lai_end = float(C.lai_from_degree_days(
        crop, crop.degree_days_increase + 2 * crop.degree_days_decrease))
    assert lai0 < 0.5
    assert lai_peak > 0.9 * crop.lai_max
    assert lai_end < lai_peak  # declining phase


def test_degree_days_clip():
    crop = C.CropParameters(thermal_threshold=5.0, upper_thermal_threshold=25.0)
    assert float(C.degree_day_increase(crop, 10.0, 40.0)) == pytest.approx(
        (10.0 + 25.0) / 2 - 5.0)
    assert float(C.degree_day_increase(crop, -10.0, 0.0)) == 0.0


def test_root_density_matches_reference_discrete():
    """Continuous quadrature vs the reference 1-cm atom scheme."""
    grid = make_grid(depth=0.8)
    crop = C.CropParameters(root_depth_min=0.05, root_depth_max=0.8,
                            root_shape_deformation=1.0)
    length = 0.6
    dens = np.asarray(C.root_density_profile(
        crop, grid, jnp.full(grid.shape[1:], length)))[:, 0, 0]

    # reference: atoms of 1 cm over the soil depth
    n_atoms = int(0.8 * 100) + 1
    n_unrooted = int(round(crop.root_depth_min / 0.01))
    n_rooted = int(round(length / 0.01))
    thin = reference_cardioid(1.0, n_rooted, n_unrooted, n_atoms)
    depths = np.asarray(grid.layer_depth)
    thicks = np.asarray(grid.layer_thickness)
    ref = np.zeros(grid.n_layers)
    for atom in range(n_atoms):
        z = atom * 0.01
        for l in range(grid.n_layers):
            if depths[l] - thicks[l] / 2 <= z <= depths[l] + thicks[l] / 2:
                ref[l] += thin[atom]
                break
    ref /= ref.sum()

    assert dens.sum() == pytest.approx(1.0, abs=1e-9)
    np.testing.assert_allclose(dens[1:], ref[1:], atol=0.03)


def test_transpiration_stress_response():
    grid = make_grid()
    params = SolverParameters()
    crop = C.CropParameters()
    et0 = jnp.full(grid.shape[1:], 0.5)      # [mm/h]
    lai = jnp.full(grid.shape[1:], 3.0)
    dd = jnp.full(grid.shape[1:], 1500.0)

    theta_sat, theta_fc, theta_wp, _ = C.water_content_thresholds(grid, params)

    # moist soil (at field capacity): transpiration near potential
    sink_fc, act_fc = C.transpiration_sink(grid, params, crop, theta_fc, et0, lai, dd)
    pot = float(C.potential_transpiration(et0, lai, crop.kc_max)[0, 0])
    assert float(act_fc[0, 0]) == pytest.approx(pot, rel=1e-6)
    assert float(jnp.sum(sink_fc)) < 0  # water removed

    # bone-dry soil: no transpiration
    sink_dry, act_dry = C.transpiration_sink(grid, params, crop, theta_wp, et0, lai, dd)
    assert float(act_dry[0, 0]) == 0.0

    # intermediate: between 0 and potential
    theta_mid = theta_wp + 0.25 * (theta_fc - theta_wp)
    _, act_mid = C.transpiration_sink(grid, params, crop, theta_mid, et0, lai, dd)
    assert 0.0 < float(act_mid[0, 0]) < pot


def test_evaporation_sink():
    grid = make_grid()
    params = SolverParameters()
    et0 = jnp.full(grid.shape[1:], 0.4)
    lai = jnp.zeros(grid.shape[1:])          # bare soil: full evaporation
    theta = jnp.full(grid.shape, 0.30)
    surface_water = jnp.full(grid.shape[1:], 0.001)   # 1 mm ponded

    sink, actual = C.evaporation_sink(grid, params, theta, surface_water, et0, lai)
    a = float(actual[0, 0])
    assert 0 < a <= 0.4 + 1e-9
    # surface water evaporates first (1 mm available, 0.4 mm demanded)
    assert float(sink[0, 0, 0]) < 0
    # total sink matches actual evaporation
    total_flow = -float(jnp.sum(sink[:, 0, 0]))  # [m3 s-1]
    assert total_flow * 3600.0 / float(grid.area) * 1000.0 == pytest.approx(a, rel=1e-9)


def test_factor_of_safety_behaviour():
    grid = make_grid()
    params = SolverParameters()
    slope = jnp.full(grid.shape[1:], 35.0)   # steep
    h_dry = grid.z - 3.0                     # dry: strong suction
    from criteria3d_tpu.solver.water import compute_se
    se_dry = compute_se(grid, params, h_dry)
    fos_dry = C.factor_of_safety(grid, params, h_dry, se_dry, slope)

    h_wet = grid.z - 0.001
    se_wet = compute_se(grid, params, h_wet)
    fos_wet = C.factor_of_safety(grid, params, h_wet, se_wet, slope)

    # wetting reduces the factor of safety (suction stress lost)
    l = grid.n_layers - 1
    assert float(fos_wet[l, 0, 0]) < float(fos_dry[l, 0, 0])
    # gentle slopes are stable
    fos_flat = C.factor_of_safety(grid, params, h_dry, se_dry,
                                  jnp.full(grid.shape[1:], 5.0))
    assert float(fos_flat[l, 0, 0]) > 1.0
