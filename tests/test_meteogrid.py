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
