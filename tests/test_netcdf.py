"""NetCDF handler tests (reference: agrolib/netcdfHandler)."""

import datetime as dt

import numpy as np
import pytest

from criteria3d_tpu.io.esri import RasterHeader
from criteria3d_tpu.io.netcdf import NetCDFHandler, export_raster, export_series


def _header(nrows=6, ncols=8, cellsize=100.0):
    return RasterHeader(nrows=nrows, ncols=ncols, xllcorner=700000.0,
                        yllcorner=4900000.0, cellsize=cellsize,
                        nodata=-9999.0)


def test_export_and_read_single_raster(tmp_path):
    header = _header()
    grid = np.arange(48, dtype=float).reshape(6, 8)
    path = str(tmp_path / "wp.nc")
    export_raster(path, grid, header, var_name="WP", unit="m",
                  long_name="water potential")
    h = NetCDFHandler().read(path)
    assert h.is_utm and not h.is_lat_lon
    assert h.is_loaded() and h.nr_variables == 1
    assert h.variables[0].name == "WP"
    assert h.variables[0].unit == "m"
    out, hdr2 = h.extract_raster("WP")
    np.testing.assert_allclose(out, grid)
    assert hdr2.cellsize == pytest.approx(100.0)
    assert hdr2.xllcorner == pytest.approx(700000.0)
    assert hdr2.yllcorner == pytest.approx(4900000.0)
    h.close()


def test_export_series_time_axis(tmp_path):
    header = _header(4, 4)
    grids = np.stack([np.full((4, 4), float(i)) for i in range(5)])
    t0 = dt.datetime(2024, 5, 1, 0)
    times = [t0 + dt.timedelta(hours=i) for i in range(5)]
    path = str(tmp_path / "series.nc")
    export_series(path, grids, header, times, var_name="PREC", unit="mm")
    h = NetCDFHandler().read(path)
    assert h.is_time_readable()
    assert h.nr_time == 5
    assert h.is_hourly and not h.is_daily
    assert h.get_time(0) == t0
    assert h.get_time(4) == times[4]
    assert "2024-05-01" in h.get_datetime_str(2)
    out, _ = h.extract_raster("PREC", time_index=3)
    np.testing.assert_allclose(out, 3.0)
    assert "PREC" in h.get_metadata()
    h.close()


def test_latlon_export(tmp_path):
    header = RasterHeader(nrows=5, ncols=5, xllcorner=11.0, yllcorner=44.0,
                          cellsize=0.1, nodata=-9999.0)
    grid = np.random.default_rng(1).normal(size=(5, 5))
    path = str(tmp_path / "ll.nc")
    export_raster(path, grid, header, var_name="T2M", is_utm=False)
    h = NetCDFHandler().read(path)
    assert h.is_lat_lon and not h.is_utm
    out, hdr = h.extract_raster("T2M")
    np.testing.assert_allclose(out, grid)
    assert hdr.cellsize == pytest.approx(0.1)
    h.close()
