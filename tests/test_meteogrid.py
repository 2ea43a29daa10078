"""Meteo grid DB: XML structure parsing + per-cell table roundtrip."""

import numpy as np
import pytest

from criteria3d_tpu.io.meteogrid import MeteoGridDb, parse_grid_xml

XML = """<?xml version="1.0"?>
<MeteoGrid>
  <gridstructure isregular="true" isutm="false" istin="false"
                 isfixedfields="false">
    <header>
      <xll>9.0</xll>
      <yll>44.0</yll>
      <nrrows>3</nrrows>
      <nrcols>4</nrcols>
      <xwidth>0.05</xwidth>
      <ywidth>0.05</ywidth>
    </header>
  </gridstructure>
  <tabledaily>
    <fieldtime>PragaTime</fieldtime>
    <prefix></prefix>
    <postfix>_D</postfix>
    <varcode>
      <varfield>tmin</varfield>
      <varcode>DAILY_TMIN</varcode>
    </varcode>
  </tabledaily>
  <tablehourly>
    <fieldtime>PragaTime</fieldtime>
    <prefix>H_</prefix>
    <postfix></postfix>
  </tablehourly>
</MeteoGrid>
"""


def test_parse_xml(tmp_path):
    p = tmp_path / "grid.xml"
    p.write_text(XML)
    s = parse_grid_xml(str(p))
    assert s.nr_rows == 3 and s.nr_cols == 4
    assert s.dx == pytest.approx(0.05)
    assert s.daily_postfix == "_D"
    assert s.hourly_prefix == "H_"
    assert s.daily_varcodes["tmin"] == "DAILY_TMIN"


def test_daily_roundtrip(tmp_path):
    p = tmp_path / "grid.xml"
    p.write_text(XML)
    s = parse_grid_xml(str(p))
    db = MeteoGridDb(str(tmp_path / "grid.db"), s)

    dates = ["2023-01-01", "2023-01-02", "2023-01-03"]
    db.write_daily("00042", dates,
                   {"tmin": [1.0, -2.0, 0.5], "tmax": [8.0, 4.0, 7.0]})

    got_dates, tmin = db.read_daily("00042", "tmin")
    assert got_dates == dates
    np.testing.assert_allclose(tmin, [1.0, -2.0, 0.5])

    codes = np.array([["00042", "00042"], ["missing", "00042"]], dtype=object)
    m = db.read_daily_map(codes, "tmax", "2023-01-02")
    assert m[0, 0] == pytest.approx(4.0)
    assert m[1, 0] == -9999.0


def test_cell_properties_and_hourly_roundtrip(tmp_path):
    from criteria3d_tpu.io.meteogrid import GridCell, cell_center

    p = tmp_path / "grid.xml"
    p.write_text(XML)
    s = parse_grid_xml(str(p))
    db = MeteoGridDb(str(tmp_path / "grid.db"), s)

    cells = [GridCell(code="001", row=0, col=0, height=120.0),
             GridCell(code="002", row=2, col=3, height=340.0),
             GridCell(code="003", row=1, col=1, active=False)]
    db.write_cell_properties(cells)
    got = db.load_cell_properties()
    assert [c.code for c in got] == ["001", "002", "003"]
    assert got[1].height == 340.0 and not got[2].active
    x, y = cell_center(s, 0, 0)
    assert x == pytest.approx(9.025) and y == pytest.approx(44.025)

    times = ["2023-06-01 00:00", "2023-06-01 01:00", "2023-06-01 02:00"]
    db.write_hourly("001", times, {101: [15.0, 14.5, 14.0],
                                   102: [0.0, 1.2, 0.0]})
    got_t, vals = db.read_hourly("001", 101)
    assert got_t == times
    np.testing.assert_allclose(vals, [15.0, 14.5, 14.0])

    codes = db.cell_codes_2d(got)
    assert codes[0, 0] == "001" and codes[2, 3] == "002"
    m = db.read_hourly_map(codes, 102, "2023-06-01 01:00")
    assert m[0, 0] == pytest.approx(1.2)
    assert m[2, 3] == -9999.0


def test_aggregate_raster_to_grid():
    from criteria3d_tpu.io.esri import RasterHeader
    from criteria3d_tpu.io.meteogrid import (MeteoGridStructure,
                                             aggregate_raster_to_grid)

    # 20x20 raster @ 10 m over a 2x2 grid of 100 m cells
    hdr = RasterHeader(nrows=20, ncols=20, xllcorner=0.0, yllcorner=0.0,
                       cellsize=10.0, nodata=-9999.0)
    s = MeteoGridStructure(nr_rows=2, nr_cols=2, ll_longitude=0.0,
                           ll_latitude=0.0, dx=100.0, dy=100.0, is_utm=True)
    vals = np.zeros((20, 20))
    vals[10:, :10] = 1.0    # raster bottom-left (south-west) quadrant = 1
    vals[:10, 10:] = 2.0    # north-east quadrant = 2
    vals[:10, :10] = 3.0    # north-west = 3
    # south-east = 0
    agg = aggregate_raster_to_grid(vals, hdr, s)
    # grid row 0 = south
    np.testing.assert_allclose(agg, [[1.0, 0.0], [3.0, 2.0]])

    # nodata coverage: kill >90% of the SW quadrant -> NODATA
    vals2 = vals.copy()
    vals2[10:, :10] = -9999.0
    vals2[10, 0] = 1.0   # a single valid cell -> 1% coverage < 10%
    agg2 = aggregate_raster_to_grid(vals2, hdr, s)
    assert agg2[0, 0] == -9999.0
    # min / max methods
    aggmax = aggregate_raster_to_grid(vals, hdr, s, method="max")
    assert aggmax[1, 0] == pytest.approx(3.0)


def test_montue_hours_from_grid_db(tmp_path):
    """VERDICT r2 item 3 'done' criterion: Montue-style hours driven from a
    synthetic meteo grid DB, with hourly DEM maps aggregated and written
    back to the grid tables."""
    import datetime
    import os

    from criteria3d_tpu.core.meteo import HOURLY_DB_IDS, MeteoVariable
    from criteria3d_tpu.io.meteogrid import GridCell
    from criteria3d_tpu.project import Criteria3DProject

    REF = "/root/reference/DATA/PROJECT"
    if not os.path.isdir(REF):
        pytest.skip("reference sample projects not found")

    # UTM grid of 2x3 cells (~65 m) covering the Montue DEM
    # (123x194 @ 1 m, xll 521616, yll 4989652)
    grid_xml = tmp_path / "grid.xml"
    grid_xml.write_text("""<?xml version="1.0"?>
<MeteoGrid>
  <gridstructure isregular="true" isutm="true">
    <header>
      <xll>521616.0</xll><yll>4989652.0</yll>
      <nrrows>2</nrrows><nrcols>3</nrcols>
      <xwidth>65.0</xwidth><ywidth>62.0</ywidth>
    </header>
  </gridstructure>
  <tablehourly>
    <fieldtime>PragaTime</fieldtime><prefix></prefix><postfix>_H</postfix>
  </tablehourly>
</MeteoGrid>
""")
    from criteria3d_tpu.io.meteogrid import MeteoGridDb, parse_grid_xml
    s = parse_grid_xml(str(grid_xml))
    db = MeteoGridDb(str(tmp_path / "grid.db"), s)

    # per-cell heights with an elevation spread -> detrending signal
    cells, heights = [], [150.0, 180.0, 210.0, 190.0, 230.0, 260.0]
    for i in range(6):
        cells.append(GridCell(code=f"C{i:03d}", row=i // 3, col=i % 3,
                              height=heights[i]))
    db.write_cell_properties(cells)

    t0 = datetime.datetime(2014, 3, 1, 8)
    times = [(t0 + datetime.timedelta(hours=k)).strftime("%Y-%m-%d %H:%M")
             for k in range(4)]
    t_code = HOURLY_DB_IDS[MeteoVariable.AIR_TEMPERATURE]
    p_code = HOURLY_DB_IDS[MeteoVariable.PRECIPITATION]
    rh_code = HOURLY_DB_IDS[MeteoVariable.AIR_REL_HUMIDITY]
    for i, c in enumerate(cells):
        base_t = 12.0 - 0.0065 * heights[i]        # lapse with height
        db.write_hourly(c.code, times, {
            t_code: [base_t + 0.5 * k for k in range(4)],
            p_code: [4.0, 4.0, 0.0, 0.0],
            rh_code: [80.0, 82.0, 78.0, 75.0]})

    prj = Criteria3DProject.load(f"{REF}/Montue/Montue.ini",
                                 output_dir=str(tmp_path / "OUT"))
    prj.load_meteo_grid(str(grid_xml), str(tmp_path / "grid.db"))
    assert len(prj.stations) == 6            # grid cells became stations
    prj.initialize()
    log = prj.run_period(t0, 2)
    assert len(log) == 2

    f = prj.run_hour(t0 + datetime.timedelta(hours=2),
                     write_outputs=False)["forcing"]
    m = np.asarray(prj.grid.mask[0])
    tmap = np.asarray(f.air_temperature)
    assert np.isfinite(tmap[m]).all()
    # forcing in the plausible range of the grid series
    assert 9.0 < tmap[m].mean() < 14.0

    # aggregate the DEM temperature map back onto the grid and persist it
    tmap_out = np.where(m, tmap, -9999.0)
    agg = prj.export_hourly_to_grid(t_code, tmap_out,
                                    t0 + datetime.timedelta(hours=2))
    valid = agg != -9999.0
    assert valid.sum() >= 4                  # most grid cells covered
    assert abs(agg[valid].mean() - tmap[m].mean()) < 1.0

    # written back: read the map from the DB again
    codes = db.cell_codes_2d(cells)
    m2 = db.read_hourly_map(codes, t_code,
                            t0 + datetime.timedelta(hours=2))
    np.testing.assert_allclose(m2[valid], agg[valid], atol=1e-6)
