"""criteriaOutput post-processing tests (reference: agrolib/criteriaOutput)."""

import datetime as dt
import sqlite3

import numpy as np
import pytest

from criteria3d_tpu.io.criteria_output import (
    NODATA, AggregationVariableList, OutputVariableList,
    compute_all_dtx_unit, compute_dtx, compute_dtx_var, order_csv_by_field,
    select_simple_var, write_csv_aggregation_from_shape,
    write_csv_output_unit, write_dtx_to_db)


@pytest.fixture
def unit_db():
    db = sqlite3.connect(":memory:")
    db.execute('CREATE TABLE "CASE1" (DATE TEXT, TRANSP_MAX REAL, '
               "TRANSP REAL, IRRIGATION REAL, LAI REAL)")
    d0 = dt.date(2024, 6, 1)
    for i in range(200):
        date = d0 + dt.timedelta(days=i)
        db.execute('INSERT INTO "CASE1" VALUES (?,?,?,?,?)',
                   (date.isoformat(), 4.0, 3.0, 10.0 if i % 7 == 0 else 0.0,
                    2.0 + 0.01 * i))
    db.commit()
    return db


def test_compute_dtx_window_semantics():
    tm = np.full(40, 5.0)
    tr = np.full(40, 3.0)
    dtx = compute_dtx(tm, tr, 30)
    assert np.isclose(dtx[:29], NODATA).all()       # incomplete window
    assert dtx[29] == pytest.approx(60.0)            # 30 x 2 mm deficit
    # NODATA inside the window invalidates it
    tr2 = tr.copy()
    tr2[35] = NODATA
    dtx2 = compute_dtx(tm, tr2, 30)
    assert np.isclose(dtx2[35], NODATA)
    assert np.isclose(dtx2[39], NODATA)              # window covers day 35
    assert dtx2[34] == pytest.approx(60.0)           # window ends before it


def test_dtx_negative_deficit_clamped():
    tm = np.full(30, 2.0)
    tr = np.full(30, 3.0)                            # transp > max
    dtx = compute_dtx(tm, tr, 30)
    assert dtx[29] == pytest.approx(0.0)


def test_compute_all_dtx_and_write(unit_db):
    dt30, dt90, dt180 = compute_all_dtx_unit(unit_db, "CASE1")
    assert dt30[29] == pytest.approx(30.0)
    assert dt90[89] == pytest.approx(90.0)
    assert np.isclose(dt180[100], NODATA)
    write_dtx_to_db(unit_db, "CASE1", dt30, dt90, dt180)
    row = unit_db.execute('SELECT DT30 FROM "CASE1" WHERE DATE=?',
                          ((dt.date(2024, 6, 1) +
                            dt.timedelta(days=29)).isoformat(),)).fetchone()
    assert row[0] == pytest.approx(30.0)


def test_tr_s_precedence():
    db = sqlite3.connect(":memory:")
    db.execute('CREATE TABLE "C" (DATE TEXT, TRANSP_MAX REAL, TRANSP REAL, '
               "TR_S REAL)")
    d0 = dt.date(2024, 1, 1)
    for i in range(30):
        db.execute('INSERT INTO "C" VALUES (?,?,?,?)',
                   ((d0 + dt.timedelta(days=i)).isoformat(), 4.0, 4.0, 1.0))
    dt30, _, _ = compute_all_dtx_unit(db, "C")
    assert dt30[29] == pytest.approx(90.0)           # used TR_S (deficit 3)


def test_select_simple_var(unit_db):
    first = dt.date(2024, 6, 1)
    last = dt.date(2024, 6, 30)
    s = select_simple_var(unit_db, "CASE1", "TRANSP", "SUM", first, last)
    assert s == [pytest.approx(90.0)]
    mx = select_simple_var(unit_db, "CASE1", "LAI", "MAX", first, last)
    assert mx[0] == pytest.approx(2.29)
    daily = select_simple_var(unit_db, "CASE1", "LAI", "", first, last)
    assert len(daily) == 30
    irr = select_simple_var(unit_db, "CASE1", "IRRIGATION", "SUM", first,
                            last, irri_ratio=0.5)
    assert irr[0] == pytest.approx(0.5 * 10.0 * 5)   # days 0,7,14,21,28


def test_compute_dtx_var(unit_db):
    first = dt.date(2024, 8, 1)
    vals = compute_dtx_var(unit_db, "CASE1", 30, "", first, first)
    assert vals[0] == pytest.approx(30.0)
    # window extending before the data start -> incomplete
    early = compute_dtx_var(unit_db, "CASE1", 30, "", dt.date(2024, 6, 5),
                            dt.date(2024, 6, 5))
    assert np.isclose(early[0], NODATA)


def test_variable_list_parsing(tmp_path):
    p = tmp_path / "vars.csv"
    p.write_text(
        "output var name,var name,reference day,computation,nr days,"
        "climate computation,param1,param2\n"
        "TRANSP_SUM,TRANSP,-30,SUM,30,,0,0\n"
        "DT30_VAL,DT30,0,,1,,0,0\n")
    v = OutputVariableList.parse(str(p))
    assert len(v) == 2
    assert v.var_names == ["TRANSP", "DT30"]
    assert v.reference_days == [-30, 0]
    assert v.computations == ["SUM", ""]

    a = tmp_path / "aggr.csv"
    a.write_text("output var name,input field name,aggregation type\n"
                 "TAVG,TRANSP_SUM,AVG\n")
    al = AggregationVariableList.parse(str(a))
    assert al.aggregation_types == ["AVG"]


def test_write_csv_output_unit_and_sort(unit_db, tmp_path):
    p = tmp_path / "vars.csv"
    p.write_text(
        "output var name,var name,reference day,computation,nr days,"
        "climate computation,param1,param2\n"
        "TRANSP_SUM,TRANSP,-29,SUM,30,,0,0\n"
        "DT30,DT30,0,,1,,0,0\n")
    variables = OutputVariableList.parse(str(p))
    out = tmp_path / "out.csv"
    missing = write_csv_output_unit("CASE1", "MAIZE", unit_db,
                                    dt.date(2024, 8, 1), variables, str(out))
    assert missing == 0
    unit_db.execute('CREATE TABLE "ACASE" AS SELECT * FROM "CASE1"')
    write_csv_output_unit("ACASE", "MAIZE", unit_db, dt.date(2024, 8, 1),
                          variables, str(out))
    order_csv_by_field(str(out), "ID_CASE")
    lines = out.read_text().strip().splitlines()
    assert lines[0].startswith("DATE,ID_CASE,CROP,TRANSP_SUM,DT30")
    assert lines[1].split(",")[1] == "ACASE"
    assert float(lines[2].split(",")[3]) == pytest.approx(90.0)
    assert float(lines[2].split(",")[4]) == pytest.approx(30.0)


def test_aggregation_csv_from_shape(tmp_path):
    from criteria3d_tpu.io.shapefile import (POLYGON, DbfField, ShapeHandler,
                                             ShapeObject)
    import numpy as np
    h = ShapeHandler()
    h.new_shapefile(str(tmp_path / "r.shp"), POLYGON)
    h.fields = [DbfField("ZONE", "C", 8, 0), DbfField("TAVG", "N", 12, 2)]
    sq = np.array([[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]], float)
    h.add_shape(ShapeObject(POLYGON, [sq]), {"ZONE": "A", "TAVG": 3.25})
    h.add_shape(ShapeObject(POLYGON, [sq + 10]), {"ZONE": "B", "TAVG": 4.5})
    out = tmp_path / "aggr_out.csv"
    n = write_csv_aggregation_from_shape(h, str(out), dt.date(2024, 8, 1),
                                         ["TAVG"], ["TAVG_OUT"], "ZONE")
    assert n == 2
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "DATE,ZONE ID,TAVG_OUT"
    assert lines[1].split(",")[1] == "A"
    assert float(lines[1].split(",")[2]) == pytest.approx(3.25)
