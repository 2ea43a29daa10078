"""Database readers tested against the reference's own sample DBs."""

import numpy as np
import pytest

from criteria3d_tpu.io.database import (fit_van_genuchten, read_crop_db,
                                        read_land_units, read_meteo_points_db,
                                        read_soil_db)

SOIL_DB = "/root/reference/DATA/PROJECT/Montue/DATA/soil_Montue.db"
CROP_DB = "/root/reference/DATA/TEMPLATE/crop_default.db"
METEO_DB = "/root/reference/DATA/PROJECT/Montue/DATA/meteo1D.db"
FITTING_DB = "/root/reference/DATA/SOIL/soil_test_fitting.db"


def test_read_montue_soil():
    soils = read_soil_db(SOIL_DB)
    assert "montue" in soils
    montue = soils["montue"]
    assert len(montue.horizons) >= 2
    h0 = montue.horizons[0]
    assert h0.upper_depth == 0.0
    assert h0.lower_depth == pytest.approx(0.22)
    assert 0 < h0.clay < 100
    # VG parameters assigned (class defaults or fit)
    assert h0.vg_n > 1.0
    assert 0 < h0.theta_s <= 0.6
    assert h0.k_sat > 0
    assert montue.total_depth > 0.5
    assert montue.horizon_at(0.1) is h0


def test_vg_fitting_roundtrip():
    """Fit recovers parameters from synthetic retention data."""
    alpha, n, tr, ts = 1.5, 1.45, 0.06, 0.42
    psi_kpa = np.array([1, 3, 10, 33, 100, 300, 1500], float)
    psi_m = psi_kpa / 9.80665
    se = (1 + (alpha * psi_m) ** n) ** (-(1 - 1 / n))
    theta = tr + se * (ts - tr)
    fit = fit_van_genuchten(np.column_stack([psi_kpa, theta]), theta_s0=ts)
    assert fit is not None
    assert fit[0] == pytest.approx(alpha, rel=0.05)
    assert fit[1] == pytest.approx(n, rel=0.03)
    assert fit[3] == pytest.approx(ts, abs=0.01)


def test_soil_fitting_db():
    soils = read_soil_db(FITTING_DB)
    assert len(soils) >= 1
    for s in soils.values():
        for h in s.horizons:
            assert h.vg_n > 1.0


def test_read_crop_db():
    crops = read_crop_db(CROP_DB)
    assert len(crops) > 10
    corn = crops.get("EARLYCORN")
    assert corn is not None
    assert corn.lai_max > corn.lai_min
    params = corn.to_parameters()
    assert params.kc_max > 1.0
    assert params.lai_curve_b < 0


def test_read_land_units():
    units = read_land_units(CROP_DB)
    assert len(units) > 0
    assert all(u["roughness"] > 0 for u in units)


def test_read_meteo_points():
    points = read_meteo_points_db(METEO_DB)
    assert len(points) == 1
    p = points[0]
    assert p.name == "montue"
    assert p.latitude == pytest.approx(45.06)
    assert "tmin" in p.daily and "prec" in p.daily
    assert len(p.daily["tmin"]) > 300
    assert np.isfinite(p.daily["tmax"]).all()
