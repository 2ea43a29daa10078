"""Shapefile handler + shape utilities tests
(reference: agrolib/shapeHandler, agrolib/shapeUtilities)."""

import numpy as np
import pytest

from criteria3d_tpu.io.esri import RasterHeader
from criteria3d_tpu.io.shapefile import (
    POINT, POLYGON, POLYLINE, DbfField, ShapeHandler, ShapeObject)
from criteria3d_tpu.io.shape_utils import (
    fill_raster_with_shape_index, initialize_raster_from_shape,
    rasterize_shape, shape_from_csv, zonal_statistics_shape,
    zonal_statistics_vector)


def square(x0, y0, size):
    """Clockwise square ring (outer-ring orientation)."""
    return np.array([[x0, y0], [x0, y0 + size], [x0 + size, y0 + size],
                     [x0 + size, y0], [x0, y0]])


def make_two_squares(tmp_path):
    h = ShapeHandler()
    h.new_shapefile(str(tmp_path / "zones.shp"), POLYGON)
    h.fields = [DbfField("ID", "N", 10, 0), DbfField("NAME", "C", 16, 0),
                DbfField("VAL", "F", 12, 3)]
    h.add_shape(ShapeObject(POLYGON, [square(0, 0, 100)]),
                {"ID": 1, "NAME": "west", "VAL": 1.5})
    h.add_shape(ShapeObject(POLYGON, [square(100, 0, 100)]),
                {"ID": 2, "NAME": "east", "VAL": 2.5})
    h.save()
    return h


def test_roundtrip_polygon(tmp_path):
    make_two_squares(tmp_path)
    h2 = ShapeHandler().open(str(tmp_path / "zones.shp"))
    assert h2.shape_type == POLYGON
    assert h2.shape_count == 2
    assert h2.field_count == 3
    assert h2.get_numeric_value(0, "ID") == 1
    assert h2.get_string_value(1, "NAME") == "east"
    assert h2.get_numeric_value(1, "VAL") == pytest.approx(2.5)
    np.testing.assert_allclose(h2.shapes[0].parts[0], square(0, 0, 100))


def test_roundtrip_point_and_polyline(tmp_path):
    h = ShapeHandler()
    h.new_shapefile(str(tmp_path / "pts.shp"), POINT)
    h.fields = [DbfField("ID", "N", 6, 0)]
    h.add_shape(ShapeObject(POINT, [np.array([[12.5, 44.5]])]), {"ID": 7})
    h.save()
    h2 = ShapeHandler().open(str(tmp_path / "pts.shp"))
    assert h2.shapes[0].parts[0][0, 0] == pytest.approx(12.5)

    hl = ShapeHandler()
    hl.new_shapefile(str(tmp_path / "lines.shp"), POLYLINE)
    hl.fields = [DbfField("ID", "N", 6, 0)]
    hl.add_shape(ShapeObject(POLYLINE, [np.array([[0., 0.], [10., 5.],
                                                  [20., 0.]])]), {"ID": 1})
    hl.save()
    h3 = ShapeHandler().open(str(tmp_path / "lines.shp"))
    assert h3.shapes[0].vertex_count == 3


def test_point_in_polygon_with_hole():
    outer = square(0, 0, 100)
    hole = square(40, 40, 20)[::-1]          # reversed orientation = hole
    shape = ShapeObject(POLYGON, [outer, hole])
    assert shape.contains(10, 10)
    assert not shape.contains(50, 50)        # inside the hole
    assert not shape.contains(150, 50)
    assert shape.is_hole(1) != shape.is_hole(0)


def test_get_shape_index_from_point(tmp_path):
    h = make_two_squares(tmp_path)
    assert h.get_shape_index_from_point(50, 50) == 0
    assert h.get_shape_index_from_point(150, 50) == 1
    assert h.get_shape_index_from_point(250, 50) == -1


def test_deleted_records_and_pack(tmp_path):
    h = make_two_squares(tmp_path)
    h.delete_record(0)
    assert h.exist_record_deleted()
    assert h.get_shape_index_from_point(50, 50) == -1
    h.save()
    h2 = ShapeHandler().open(str(tmp_path / "zones.shp"))
    assert h2.deleted == [True, False]
    h2.pack()
    assert h2.shape_count == 1
    assert h2.get_numeric_value(0, "ID") == 2


def test_rasterize_field(tmp_path):
    h = make_two_squares(tmp_path)
    grid, header = rasterize_shape(h, "VAL", cellsize=10.0)
    assert header.ncols == 20 and header.nrows == 10
    # west half = 1.5, east half = 2.5
    assert np.allclose(grid[:, :10], 1.5)
    assert np.allclose(grid[:, 10:], 2.5)


def test_zonal_statistics(tmp_path):
    h = make_two_squares(tmp_path)
    zones, header = initialize_raster_from_shape(h, 10.0)
    fill_raster_with_shape_index(zones, header, h)
    # value raster: gradient in x
    xs = np.arange(header.ncols) * 10.0 + 5.0
    values = np.broadcast_to(xs, (header.nrows, header.ncols)).copy()
    stats = zonal_statistics_vector(zones, values, h.shape_count, "AVG")
    assert stats[0] == pytest.approx(50.0)    # mean of 5..95
    assert stats[1] == pytest.approx(150.0)
    mx = zonal_statistics_vector(zones, values, h.shape_count, "MAX")
    assert mx[1] == pytest.approx(195.0)
    med = zonal_statistics_vector(zones, values, h.shape_count, "MEDIAN")
    assert med[0] == pytest.approx(50.0)
    stats2 = zonal_statistics_shape(h, zones, values, "XMEAN")
    assert h.exist_field("XMEAN")
    assert h.get_numeric_value(1, "XMEAN") == pytest.approx(150.0)
    assert np.allclose(stats2, stats)


def test_zonal_majority_and_threshold(tmp_path):
    h = make_two_squares(tmp_path)
    zones, header = initialize_raster_from_shape(h, 10.0)
    fill_raster_with_shape_index(zones, header, h)
    values = np.full(zones.shape, 3.0)
    values[:, :3] = 7.0
    maj = zonal_statistics_vector(zones, values, 2, "MAJORITY")
    assert maj[0] == 3.0
    # zone 0 fully nodata -> below threshold -> stays nodata
    values2 = np.full(zones.shape, -9999.0)
    values2[:, 10:] = 1.0
    out = zonal_statistics_vector(zones, values2, 2, "AVG", threshold=0.5)
    assert out[0] == -9999.0
    assert out[1] == pytest.approx(1.0)


def test_shape_from_csv(tmp_path):
    h = make_two_squares(tmp_path)
    csv_path = tmp_path / "attrs.csv"
    csv_path.write_text("ID,CROP,YIELD\n1,MAIZE,11.5\n2,WHEAT,6.0\n")
    n = shape_from_csv(h, str(csv_path), "ID")
    assert n == 2
    assert h.get_string_value(0, "CROP") == "MAIZE"
    assert h.get_numeric_value(1, "YIELD") == pytest.approx(6.0)


def test_prj_parsing(tmp_path):
    h = make_two_squares(tmp_path)
    (tmp_path / "zones.prj").write_text(
        'PROJCS["WGS_1984_UTM_Zone_32N",GEOGCS["GCS_WGS_1984"]]')
    h2 = ShapeHandler().open(str(tmp_path / "zones.shp"))
    assert h2.is_wgs84 and h2.utm_zone == 32 and h2.is_north
