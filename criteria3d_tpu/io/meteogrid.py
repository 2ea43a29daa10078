"""Meteo grid database: XML-described gridded weather storage.

Re-implements the structure of agrolib/dbMeteoGrid (Crit3DMeteoGridDbHandler):
an XML file describes the grid geometry (GridStructure/XLL/YLL/NrRows/NrCols/
XWidth/YWidth) and the per-cell table naming scheme (TableDaily/TableHourly
prefix/postfix + VarCode list); the data live in one SQL table per grid cell.

The reference targets MySQL (ARPAE's operational grid) with SQLite also
possible through Qt SQL; here SQLite is the backend (MySQL is site
infrastructure, not model capability).
"""

from __future__ import annotations

import dataclasses
import sqlite3
import xml.etree.ElementTree as ET

import numpy as np

from criteria3d_tpu.constants import NODATA

__all__ = ["MeteoGridStructure", "MeteoGridDb", "parse_grid_xml"]


@dataclasses.dataclass
class MeteoGridStructure:
    """GridStructure section of the XML (dbMeteoGrid.cpp:169-320)."""

    is_regular: bool = True
    is_utm: bool = False
    nr_rows: int = 0
    nr_cols: int = 0
    ll_longitude: float = 0.0
    ll_latitude: float = 0.0
    dx: float = 0.0
    dy: float = 0.0
    # table naming
    daily_prefix: str = ""
    daily_postfix: str = "_D"
    hourly_prefix: str = ""
    hourly_postfix: str = "_H"
    daily_field_time: str = "PragaTime"
    hourly_field_time: str = "PragaTime"
    daily_varcodes: dict = dataclasses.field(default_factory=dict)
    hourly_varcodes: dict = dataclasses.field(default_factory=dict)


def parse_grid_xml(path: str) -> MeteoGridStructure:
    """Parse the XML description (loadCellProperties-style schema)."""
    tree = ET.parse(path)
    root = tree.getroot()
    s = MeteoGridStructure()

    for node in root:
        tag = node.tag.upper()
        if tag == "GRIDSTRUCTURE":
            s.is_regular = node.attrib.get("isregular", "true").lower() == "true"
            s.is_utm = node.attrib.get("isutm", "false").lower() == "true"
            for child in node.iter():
                t = child.tag.upper()
                text = (child.text or "").strip()
                if t == "XLL":
                    s.ll_longitude = float(text)
                elif t == "YLL":
                    s.ll_latitude = float(text)
                elif t in ("NROWS", "NRROWS"):
                    s.nr_rows = int(text)
                elif t in ("NCOLS", "NRCOLS"):
                    s.nr_cols = int(text)
                elif t == "XWIDTH":
                    s.dx = float(text)
                elif t == "YWIDTH":
                    s.dy = float(text)
        elif tag in ("TABLEDAILY", "TABLEHOURLY"):
            daily = tag == "TABLEDAILY"
            for child in node:
                t = child.tag.upper()
                text = (child.text or "").strip()
                if t == "FIELDTIME":
                    if daily:
                        s.daily_field_time = text
                    else:
                        s.hourly_field_time = text
                elif t == "PREFIX":
                    if daily:
                        s.daily_prefix = text
                    else:
                        s.hourly_prefix = text
                elif t == "POSTFIX":
                    if daily:
                        s.daily_postfix = text
                    else:
                        s.hourly_postfix = text
                elif t == "VARCODE":
                    varname, code = None, None
                    for vc in child:
                        if vc.tag.upper() == "VARFIELD":
                            varname = (vc.text or "").strip()
                        elif vc.tag.upper() == "VARCODE":
                            code = (vc.text or "").strip()
                    if varname:
                        if daily:
                            s.daily_varcodes[varname] = code
                        else:
                            s.hourly_varcodes[varname] = code
    return s


class MeteoGridDb:
    """Reader/writer for the per-cell table layout."""

    def __init__(self, db_path: str, structure: MeteoGridStructure):
        self.path = db_path
        self.structure = structure

    def _table(self, cell_code: str, daily: bool) -> str:
        s = self.structure
        if daily:
            return f"{s.daily_prefix}{cell_code}{s.daily_postfix}"
        return f"{s.hourly_prefix}{cell_code}{s.hourly_postfix}"

    def write_daily(self, cell_code: str, dates, values: dict) -> None:
        con = sqlite3.connect(self.path)
        cur = con.cursor()
        table = self._table(cell_code, daily=True)
        cols = list(values.keys())
        cur.execute(
            f'CREATE TABLE IF NOT EXISTS "{table}" '
            f'({self.structure.daily_field_time} TEXT PRIMARY KEY, '
            + ", ".join(f'"{c}" REAL' for c in cols) + ")")
        for i, d in enumerate(dates):
            cur.execute(
                f'INSERT OR REPLACE INTO "{table}" VALUES (?'
                + ", ?" * len(cols) + ")",
                [str(d)] + [float(values[c][i]) for c in cols])
        con.commit()
        con.close()

    def read_daily(self, cell_code: str, variable: str) -> tuple:
        """(dates, values) for one variable of one cell."""
        con = sqlite3.connect(f"file:{self.path}?mode=ro", uri=True)
        cur = con.cursor()
        table = self._table(cell_code, daily=True)
        ft = self.structure.daily_field_time
        try:
            rows = cur.execute(
                f'SELECT {ft}, "{variable}" FROM "{table}" ORDER BY {ft}'
            ).fetchall()
        except sqlite3.OperationalError:
            con.close()
            return [], np.array([])
        con.close()
        dates = [r[0] for r in rows]
        vals = np.array([r[1] if r[1] is not None else NODATA for r in rows])
        return dates, vals

    def read_daily_map(self, cell_codes_2d, variable: str, date: str
                       ) -> np.ndarray:
        """(nr_rows, nr_cols) map of one variable at one date; NODATA gaps."""
        con = sqlite3.connect(f"file:{self.path}?mode=ro", uri=True)
        cur = con.cursor()
        out = np.full(np.shape(cell_codes_2d), NODATA)
        ft = self.structure.daily_field_time
        for (r, c), code in np.ndenumerate(np.asarray(cell_codes_2d, object)):
            table = self._table(str(code), daily=True)
            try:
                row = cur.execute(
                    f'SELECT "{variable}" FROM "{table}" WHERE {ft}=?',
                    (date,)).fetchone()
            except sqlite3.OperationalError:
                continue
            if row and row[0] is not None:
                out[r, c] = row[0]
        con.close()
        return out
