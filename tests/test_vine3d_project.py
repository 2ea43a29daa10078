"""End-to-end load-and-run of the reference VINE3D_test sample project.

The last reference sample project to get the Troy/Montue/STH/Cogne
treatment (VERDICT round-4 item 5): Vine3DProject-style load of
``DATA/PROJECT/VINE3D_test/VINE3D_test.ini`` — DEM, GEO field map, soil DB
(with its many-ids-per-profile UNITS join), fields DB (cultivar /
training_system / fields / field_book) — then one simulated day of the
daily cycle with booked irrigation and both disease models.

Reference: bin/VINE3D/vine3DProject.cpp:100-211 (load path),
bin/VINE3D/modelCore.cpp:90-271 (daily cycle).
"""

import datetime
import os

import numpy as np
import pytest

from criteria3d_tpu.vine3d import FieldOperation
from criteria3d_tpu.vine3d_project import Vine3DProject

INI = "/root/reference/DATA/PROJECT/VINE3D_test/VINE3D_test.ini"

pytestmark = pytest.mark.skipif(not os.path.exists(INI),
                                reason="VINE3D_test sample not found")


@pytest.fixture(scope="module")
def vine_prj(tmp_path_factory):
    out = tmp_path_factory.mktemp("vine3d_out")
    prj = Vine3DProject.load(INI, output_dir=str(out))
    prj.initialize()
    return prj


def test_load_vine_db(vine_prj):
    # 23 cultivars / 3 training systems / 2 fields in the shipped DB
    assert len(vine_prj.cultivars) == 23
    assert len(vine_prj.trainings) == 3
    assert set(vine_prj.fields) == {0, 1}
    assert vine_prj.fields[1].is_vineyard
    assert vine_prj.fields[1].max_irrigation_rate == 25.0
    assert not vine_prj.fields[0].is_vineyard
    # the ini turns diseases off ([settings] compute_diseases=false)
    assert vine_prj.compute_diseases is False
    # field book: two irrigation bookings (1 h each) on field 1
    irr = [e for e in vine_prj.field_book
           if e.operation == FieldOperation.IRRIGATION]
    assert len(irr) == 2
    assert {e.date for e in irr} == {datetime.date(2021, 6, 20),
                                     datetime.date(2021, 7, 10)}
    assert all(e.field_index == 1 and e.quantity == 1.0 for e in irr)


def test_cultivar_mapping(vine_prj):
    # Nebbiolo row (id 2): phenology + Wang-Leuning columns
    # (loadGrapevineParameters, vine3DProject.cpp:240-263)
    g, w = vine_prj.cultivars[2]
    assert g.critical_force_maturity == pytest.approx(106.5)
    assert g.co1 == pytest.approx(140.0)
    assert g.degree_days_veraison == pytest.approx(2734.0)
    assert w.max_carbox_rate == pytest.approx(115.0)
    assert w.alpha == pytest.approx(10.0 * 1e5)   # x1e5 on load


def test_initialize_grid_and_field_map(vine_prj):
    grid = vine_prj.base.grid
    # every soil-map unit id resolves through the shared-profile join
    # (soils table maps 7 ids onto 4 soil_codes)
    assert len(vine_prj.base.soils) == 7
    assert int(np.asarray(grid.mask[0]).sum()) > 7000
    # the land_units raster has 5 vineyard (id_field=1) cells
    assert int((vine_prj.field_map == 1).sum()) == 5
    assert int(np.asarray(vine_prj.model.vineyard_mask).sum()) == 5
    # Chardonnay (field 1 cultivar) training system 1: 9.1 shoots/plant
    assert vine_prj.model.training.shoots_per_plant == pytest.approx(9.1)
    assert vine_prj.model.max_irrigation_rate == 25.0


def test_one_simulated_day(vine_prj, tmp_path):
    """One day of the daily cycle on 2021-06-20: the field book books 1 h
    of irrigation, so hour 23 irrigates the 5 vineyard cells at
    25 mm h-1 (assignIrrigation, modelCore.cpp:43-88)."""
    prj = vine_prj
    prj.model.compute_diseases = True    # exercise both mildews too
    day = prj.run_day(datetime.date(2021, 6, 20))

    # irrigation reached exactly the vineyard cells in the last hour
    irr = np.asarray(day["irrigation_mm"])
    assert float(irr.max()) == pytest.approx(25.0)
    assert int((irr > 0).sum()) == 5

    # the whole-day water balance closes (MBR uses the |sink| denominator,
    # DEVIATIONS #30 — this day is drainage-dominated, net sink < 0)
    assert abs(day["mbr"]) < 5e-3
    assert float(np.asarray(prj.model.water.balance_whole.sink_source)) < 0

    # disease + phenology outputs exist and are finite
    risk = np.asarray(day["powdery_infection_risk"])
    assert np.isfinite(risk).all() and float(risk.max()) >= 0.0
    assert np.isfinite(np.asarray(day["lai"])).all()

    # write the day's maps (the reference saves output rasters per day)
    from criteria3d_tpu.io.esri import write_flt
    hdr = prj.base.header
    for name, arr in (("lai", day["lai"]), ("stage", day["stage"])):
        write_flt(str(tmp_path / name), np.asarray(arr, np.float64), hdr)
        assert (tmp_path / f"{name}.flt").exists()
