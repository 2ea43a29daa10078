"""XML-described generic meteo data import.

Re-implements agrolib/inOutDataXML: an XML format descriptor declares how a
delimited or fixed-width text file maps to (time, point code, variables);
the importer then reads any such file into per-variable numpy series.

Descriptor schema (tags matched case-insensitively, following
inOutDataXML.cpp:105-400):

    <format>
      <type>delimited|fixed</type>
      <delimiter>,</delimiter>
      <headerrows>1</headerrows>
      <missingvalue>-9999</missingvalue>
    </format>
    <time><field>0</field><format>yyyy-MM-dd HH:mm</format></time>
    <pointcode><field>1</field></pointcode>
    <variable><field>2</field><type>airTemperature</type></variable>
    ... (fixed format uses <firstchar>/<nrchar> instead of <field>)
"""

from __future__ import annotations

import dataclasses
import datetime
import xml.etree.ElementTree as ET

import numpy as np

from criteria3d_tpu.constants import NODATA

__all__ = ["ImportFormat", "FieldSpec", "parse_import_xml", "import_data"]

# Qt date format -> strptime translation (setFormat semantics)
_QT_TO_STRPTIME = [
    ("yyyy", "%Y"), ("MM", "%m"), ("dd", "%d"),
    ("HH", "%H"), ("mm", "%M"), ("ss", "%S"),
]


def qt_format_to_strptime(fmt: str) -> str:
    for qt, py in _QT_TO_STRPTIME:
        fmt = fmt.replace(qt, py)
    return fmt


@dataclasses.dataclass
class FieldSpec:
    position: int = -1        # delimited column index
    first_char: int = -1      # fixed-width start (1-based, like the reference)
    nr_char: int = 0
    name: str = ""

    def extract(self, line: str, parts: list, delimited: bool) -> str:
        if delimited:
            if 0 <= self.position < len(parts):
                return parts[self.position].strip()
            return ""
        if self.first_char >= 1:
            start = self.first_char - 1
            return line[start:start + self.nr_char].strip()
        return ""


@dataclasses.dataclass
class ImportFormat:
    delimited: bool = True
    delimiter: str = ","
    decimal_separator: str = "."
    header_rows: int = 0
    missing_value: float = float(NODATA)
    single_point: bool = True
    time: FieldSpec = dataclasses.field(default_factory=FieldSpec)
    time_format: str = "%Y-%m-%d %H:%M"
    point_code: FieldSpec = dataclasses.field(default_factory=FieldSpec)
    variables: list = dataclasses.field(default_factory=list)


def parse_import_xml(path: str) -> ImportFormat:
    root = ET.parse(path).getroot()
    fmt = ImportFormat()

    def fill_field(node, spec: FieldSpec):
        for child in node:
            t = child.tag.upper()
            text = (child.text or "").strip()
            if t in ("FIELD", "POSITION"):
                spec.position = int(text)
            elif t in ("FIRST_CHAR", "FIRSTCHAR"):
                spec.first_char = int(text)
            elif t in ("NR_CHAR", "NUMCHAR", "NRCHAR"):
                spec.nr_char = int(text)
            elif t in ("TYPE", "NAME"):
                spec.name = text
            elif t == "FORMAT":
                fmt.time_format = qt_format_to_strptime(text)

    for node in root:
        tag = node.tag.upper()
        if tag == "FORMAT":
            for child in node:
                t = child.tag.upper()
                text = (child.text or "").strip()
                if t == "TYPE":
                    fmt.delimited = text.upper() not in ("FIXED",
                                                         "XMLFORMATFIXED")
                elif t == "DELIMITER":
                    fmt.delimiter = text or ","
                elif t == "DECIMALSEPARATOR":
                    fmt.decimal_separator = text or "."
                elif t in ("HEADER", "HEADERROWS", "NUMHEADERROWS"):
                    fmt.header_rows = int(text)
                elif t in ("MISSINGVALUE", "MISSING_VALUE", "NODATA"):
                    fmt.missing_value = float(text)
                elif t == "ATTRIBUTE":
                    fmt.single_point = text.upper() == "SINGLEPOINT"
        elif tag == "TIME":
            fill_field(node, fmt.time)
        elif tag == "POINTCODE":
            fill_field(node, fmt.point_code)
        elif tag == "VARIABLE":
            spec = FieldSpec()
            fill_field(node, spec)
            fmt.variables.append(spec)
    return fmt


def import_data(data_path: str, fmt: ImportFormat) -> dict:
    """Read a data file with the parsed format.

    Returns ``{"time": [datetime...], "point": [codes...],
    "<variable name>": np.array}`` with NODATA gaps.
    """
    times, points = [], []
    series = {v.name or f"var{i}": [] for i, v in enumerate(fmt.variables)}

    with open(data_path) as f:
        for i, line in enumerate(f):
            if i < fmt.header_rows or not line.strip():
                continue
            parts = line.rstrip("\n").split(fmt.delimiter) if fmt.delimited else []

            t_str = fmt.time.extract(line, parts, fmt.delimited)
            try:
                times.append(datetime.datetime.strptime(t_str, fmt.time_format))
            except ValueError:
                continue

            points.append(fmt.point_code.extract(line, parts, fmt.delimited))

            for iv, spec in enumerate(fmt.variables):
                name = spec.name or f"var{iv}"
                raw = spec.extract(line, parts, fmt.delimited)
                if fmt.decimal_separator != ".":
                    raw = raw.replace(fmt.decimal_separator, ".")
                try:
                    v = float(raw)
                    if v == fmt.missing_value:
                        v = NODATA
                except ValueError:
                    v = NODATA
                series[name].append(v)

    out = {"time": times, "point": points}
    out.update({k: np.asarray(v) for k, v in series.items()})
    return out
