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


def test_netcdf4_hdf5_read(tmp_path):
    """NetCDF-4 (HDF5) read path (VERDICT r2 item 7): a chunked+deflated
    CF file with dimension scales, _FillValue and an hours-since time
    axis, written with h5py exactly as netcdf-c lays it out."""
    import h5py

    from criteria3d_tpu.io.netcdf import NetCDFHandler

    path = str(tmp_path / "nc4.nc")
    R, C, T = 10, 14, 3
    lat = 44.0 + 0.01 * np.arange(R)          # ascending (south-up)
    lon = 9.0 + 0.01 * np.arange(C)
    tvals = np.array([0.0, 1.0, 2.0])
    data = np.arange(T * R * C, dtype=np.float32).reshape(T, R, C)
    data[0, 0, 0] = -9999.0

    with h5py.File(path, "w") as f:
        dlat = f.create_dataset("lat", data=lat)
        dlon = f.create_dataset("lon", data=lon)
        dtime = f.create_dataset("time", data=tvals)
        for d, nm in ((dlat, "lat"), (dlon, "lon"), (dtime, "time")):
            d.make_scale(nm)
        dlat.attrs["units"] = b"degrees_north"
        dlon.attrs["units"] = b"degrees_east"
        dtime.attrs["units"] = b"hours since 2021-06-01 12:00"
        v = f.create_dataset("tair", data=data, chunks=(1, R, C),
                             compression="gzip", shuffle=True)
        v.dims[0].attach_scale(dtime)
        v.dims[1].attach_scale(dlat)
        v.dims[2].attach_scale(dlon)
        v.attrs["long_name"] = b"air temperature"
        v.attrs["units"] = b"degC"
        v.attrs["_FillValue"] = np.float32(-9999.0)

    h = NetCDFHandler().read(path)
    assert h.is_lat_lon and not h.is_utm
    assert h.nr_variables == 1
    assert h.variables[0].name == "tair"
    assert h.variables[0].unit == "degC"
    assert h.variables[0].dims == ("time", "lat", "lon")
    assert h.missing_value == -9999.0
    assert h.is_time_readable() and h.is_hourly
    assert h.get_datetime_str(2) == "2021-06-01 14:00"

    grid, hdr = h.extract_raster("tair", time_index=1)
    assert hdr.nrows == R and hdr.ncols == C
    assert hdr.cellsize == pytest.approx(0.01)
    # ascending lat in file -> row 0 = north after extraction
    np.testing.assert_allclose(grid[-1], data[1, 0].astype(np.float64))
    assert hdr.xllcorner == pytest.approx(9.0 - 0.005)
    h.close()
