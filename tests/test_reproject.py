"""Reprojection (gdalHandler gdalReprojection analogue): UTM <-> lat-lon
round trips for points, shapefile geometries and raster warps."""

import numpy as np
import pytest

from criteria3d_tpu.io.esri import RasterHeader
from criteria3d_tpu.io.reproject import (reproject_raster, reproject_shape,
                                         reproject_shapes, transform_points)


def test_point_roundtrip():
    x = np.array([680000.0, 681000.0, 685000.0])
    y = np.array([4950000.0, 4951000.0, 4960000.0])
    lon, lat = transform_points(x, y, ("utm", 32), ("latlon",))
    assert 44.0 < lat.min() and lat.max() < 45.1
    assert 11.0 < lon.min() and lon.max() < 12.0
    x2, y2 = transform_points(lon, lat, ("latlon",), ("utm", 32))
    np.testing.assert_allclose(x2, x, atol=0.01)     # cm-level round trip
    np.testing.assert_allclose(y2, y, atol=0.01)


def test_cross_zone():
    """Zone 32 -> zone 33 via geographic: the same physical point."""
    x, y = 695000.0, 4950000.0
    x33, y33 = transform_points(x, y, ("utm", 32), ("utm", 33))
    # transforms back
    xb, yb = transform_points(x33, y33, ("utm", 33), ("utm", 32))
    assert float(xb) == pytest.approx(x, abs=0.05)
    assert float(yb) == pytest.approx(y, abs=0.05)


def test_shape_reprojection():
    from criteria3d_tpu.io.shapefile import ShapeObject

    ring = np.array([[680000.0, 4950000.0], [681000.0, 4950000.0],
                     [681000.0, 4951000.0], [680000.0, 4951000.0],
                     [680000.0, 4950000.0]])
    shp = ShapeObject(5, [ring])
    ll = reproject_shape(shp, ("utm", 32), ("latlon",))
    assert ll.parts[0][:, 0].mean() == pytest.approx(11.26, abs=0.1)
    back = reproject_shapes([ll], ("latlon",), ("utm", 32))[0]
    np.testing.assert_allclose(back.parts[0], ring, atol=0.01)


def test_raster_warp_roundtrip():
    """Warp a smooth UTM raster to lat-lon and back: bilinear recovery."""
    R, C = 40, 50
    hdr = RasterHeader(nrows=R, ncols=C, xllcorner=680000.0,
                       yllcorner=4950000.0, cellsize=100.0, nodata=-9999.0)
    xs = hdr.xllcorner + (np.arange(C) + 0.5) * 100.0
    ys = hdr.yllcorner + (R - 0.5 - np.arange(R)) * 100.0
    xx, yy = np.meshgrid(xs, ys)
    vals = 1e-3 * (xx - xs.min()) + 2e-3 * (yy - ys.min())

    ll_vals, ll_hdr = reproject_raster(vals, hdr, ("utm", 32), ("latlon",),
                                       method="bilinear")
    assert ll_hdr.cellsize < 0.01            # degrees now
    valid = ll_vals != -9999.0
    assert valid.mean() > 0.6                # rotated box still mostly covered

    back, back_hdr = reproject_raster(ll_vals, ll_hdr, ("latlon",),
                                      ("utm", 32), out_header=hdr,
                                      method="bilinear")
    ok = back != -9999.0
    # interior cells survive the double warp to within interpolation error
    interior = np.zeros_like(ok)
    interior[3:-3, 3:-3] = True
    sel = ok & interior
    assert sel.mean() > 0.7
    err = np.abs(back - vals)[sel]
    assert np.median(err) < 0.05 * np.abs(vals).max() / 10


def test_raster_warp_nearest_nodata():
    hdr = RasterHeader(nrows=10, ncols=10, xllcorner=680000.0,
                       yllcorner=4950000.0, cellsize=100.0, nodata=-9999.0)
    vals = np.full((10, 10), 7.0)
    vals[0, 0] = -9999.0
    out, ohdr = reproject_raster(vals, hdr, ("utm", 32), ("latlon",),
                                 method="nearest")
    got = out[out != -9999.0]
    assert got.size > 0 and np.all(got == 7.0)
