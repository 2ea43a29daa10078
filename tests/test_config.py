"""Config loader tests against the reference's actual sample files."""

import pytest

from criteria3d_tpu.io.config import load_parameters_ini, load_project_ini

MONTUE = "/root/reference/DATA/PROJECT/Montue/Montue.ini"
PARAMS = "/root/reference/DATA/SETTINGS/parameters.ini"


def test_load_montue_project():
    cfg = load_project_ini(MONTUE)
    assert cfg.name == "Montue"
    assert cfg.latitude == pytest.approx(45.0605)
    assert cfg.utm_zone == 32
    assert cfg.dem_path.endswith("DEM_Montue.flt")
    assert cfg.output_water_content_depths == (20, 40, 60, 100, 120, 140)
    assert cfg.output_factor_of_safety_depths[0] == 1


def test_load_reference_parameters():
    cfg = load_parameters_ini(PARAMS)
    assert cfg.model_accuracy == 3
    assert cfg.conductivity_horiz_vert_ratio == pytest.approx(10.0)
    assert cfg.initial_water_potential == pytest.approx(-2.0)
    assert cfg.free_catchment_runoff
    assert cfg.linke == pytest.approx(4.0)
    assert cfg.clear_sky_transmissivity == pytest.approx(0.75)
    assert cfg.rainfall_threshold == pytest.approx(0.2)
    assert len(cfg.climate_monthly["tmin"]) == 12
    assert cfg.snow_params["tempmaxwithsnow"] == pytest.approx(2.0)


def test_solver_parameters_from_accuracy():
    cfg = load_parameters_ini(PARAMS)
    params = cfg.solver_parameters(cell_size=10.0)
    # accuracy 3: vMax=20, dtMin=min(6, 10/20)=0.5, MBR 1e-3, tol 1e-10
    assert params.delta_t_min == pytest.approx(0.5)
    assert params.delta_t_max == 3600.0
    assert params.mbr_threshold == pytest.approx(1e-3)
    assert params.residual_tolerance == pytest.approx(1e-10)
    assert params.max_iterations == 150


def test_montue_pulls_parameters_file():
    # Montue.ini points at ./SETTINGS/parameters.ini relative to project dir;
    # the reference sample keeps it at DATA/SETTINGS — absent locally is fine,
    # the loader must not crash on a missing file.
    cfg = load_project_ini(MONTUE)
    assert cfg.model_accuracy in (1, 2, 3, 4, 5)
