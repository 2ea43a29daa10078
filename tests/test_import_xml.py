"""XML-described meteo import tests (delimited + fixed width)."""

import numpy as np
import pytest

from criteria3d_tpu.io.import_xml import import_data, parse_import_xml

XML_CSV = """<?xml version="1.0"?>
<ImportData>
  <format>
    <type>delimited</type>
    <delimiter>;</delimiter>
    <headerrows>1</headerrows>
    <missingvalue>-99</missingvalue>
  </format>
  <time><field>0</field><format>yyyy-MM-dd HH:mm</format></time>
  <pointcode><field>1</field></pointcode>
  <variable><field>2</field><type>airTemperature</type></variable>
  <variable><field>3</field><type>precipitation</type></variable>
</ImportData>
"""

CSV = """time;station;t;prec
2023-05-01 00:00;MILO;12.4;0.0
2023-05-01 01:00;MILO;11.9;1.2
2023-05-01 02:00;MILO;-99;0.4
"""

XML_FIXED = """<?xml version="1.0"?>
<ImportData>
  <format><type>fixed</type><headerrows>0</headerrows></format>
  <time><firstchar>1</firstchar><nrchar>16</nrchar>
        <format>yyyy-MM-dd HH:mm</format></time>
  <pointcode><firstchar>18</firstchar><nrchar>4</nrchar></pointcode>
  <variable><firstchar>23</firstchar><nrchar>6</nrchar>
            <type>airTemperature</type></variable>
</ImportData>
"""

FIXED = (
    "2023-05-01 00:00 MILO  12.4\n"
    "2023-05-01 01:00 MILO  11.9\n"
)


def test_delimited_import(tmp_path):
    (tmp_path / "fmt.xml").write_text(XML_CSV)
    (tmp_path / "data.csv").write_text(CSV)
    fmt = parse_import_xml(str(tmp_path / "fmt.xml"))
    assert fmt.delimited and fmt.delimiter == ";" and fmt.header_rows == 1

    data = import_data(str(tmp_path / "data.csv"), fmt)
    assert len(data["time"]) == 3
    assert data["point"][0] == "MILO"
    np.testing.assert_allclose(data["airTemperature"],
                               [12.4, 11.9, -9999.0])
    np.testing.assert_allclose(data["precipitation"], [0.0, 1.2, 0.4])
    assert data["time"][1].hour == 1


def test_fixed_width_import(tmp_path):
    (tmp_path / "fmt.xml").write_text(XML_FIXED)
    (tmp_path / "data.txt").write_text(FIXED)
    fmt = parse_import_xml(str(tmp_path / "fmt.xml"))
    assert not fmt.delimited

    data = import_data(str(tmp_path / "data.txt"), fmt)
    assert len(data["time"]) == 2
    assert data["point"] == ["MILO", "MILO"]
    np.testing.assert_allclose(data["airTemperature"], [12.4, 11.9])
