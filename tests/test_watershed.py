"""Watershed / basin extraction tests (reference: agrolib/gis/watershed.cpp)."""

import numpy as np

from criteria3d_tpu.core.watershed import (
    add_terrain_depressions, clean_basin, cut_empty_frame,
    d8_flow_direction, extract_basin, flow_accumulation,
    remove_disconnected_areas)
from criteria3d_tpu.io.esri import RasterHeader


def _header(dem, cellsize=10.0, nodata=-9999.0):
    return RasterHeader(nrows=dem.shape[0], ncols=dem.shape[1],
                        xllcorner=0.0, yllcorner=0.0,
                        cellsize=cellsize, nodata=nodata)


def tilted_plane(n=10, slope=0.1, cellsize=10.0):
    """Elevation decreasing southwards (row 0 = north = highest)."""
    rows = np.arange(n)[:, None] * np.ones((1, n))
    return (n - rows) * slope * cellsize


def v_valley(n=15, cellsize=10.0):
    """Two hillslopes draining into a central N-S channel that drains south."""
    rows, cols = np.mgrid[0:n, 0:n]
    channel = n // 2
    dem = 100.0 + (n - 1 - rows) * 0.5 + np.abs(cols - channel) * 2.0
    return dem


def test_d8_points_downslope_on_tilted_plane():
    dem = tilted_plane()
    d = d8_flow_direction(dem, 10.0)
    # interior cells flow straight south (offset (1, 0) = index 6)
    assert (d[1:-1, 1:-1] == 6).all()
    # bottom row has no lower neighbour
    assert (d[-1] == -1).all()


def test_d8_nodata_isolated():
    dem = tilted_plane()
    dem[3, 3] = -9999.0
    d = d8_flow_direction(dem, 10.0, nodata=-9999.0)
    assert d[3, 3] == -1


def test_flow_accumulation_column_counts():
    dem = tilted_plane(n=8)
    acc = flow_accumulation(dem, 10.0)
    # each column accumulates straight down: bottom row = nrows cells
    assert np.allclose(acc[-1], 8.0)
    assert np.allclose(acc[0], 1.0)


def test_flow_accumulation_valley_concentrates():
    dem = v_valley()
    acc = flow_accumulation(dem, 10.0)
    channel = dem.shape[1] // 2
    # the channel outlet collects (almost) the whole grid
    assert acc[-1, channel] > 0.8 * dem.size


def test_cut_empty_frame():
    dem = np.full((10, 12), -9999.0)
    dem[3:7, 4:9] = 5.0
    hdr = _header(dem)
    out, h2 = cut_empty_frame(dem, hdr)
    assert out.shape == (4, 5)
    assert h2.nrows == 4 and h2.ncols == 5
    assert h2.xllcorner == 40.0
    # rows 7..9 removed below: yll moves up by (10-7)*cellsize
    assert h2.yllcorner == 30.0
    assert (out == 5.0).all()


def test_remove_disconnected_areas():
    basin = np.full((9, 9), -9999.0)
    basin[0:3, 0:3] = 1.0      # island
    basin[5:9, 5:9] = 2.0      # component with closure
    out = remove_disconnected_areas(basin, 6, 6)
    assert np.isclose(out[1, 1], -9999.0)
    assert np.isclose(out[6, 6], 2.0)


def test_add_terrain_depressions_fills_interior_hole():
    dem = np.full((9, 9), 10.0)
    basin = dem.copy()
    basin[4, 4] = -9999.0           # enclosed pit
    basin[0, 0] = -9999.0           # border-connected hole stays empty
    out = add_terrain_depressions(dem, basin)
    assert np.isclose(out[4, 4], 10.0)
    assert np.isclose(out[0, 0], -9999.0)


def test_extract_basin_valley():
    dem = v_valley()
    hdr = _header(dem)
    channel = dem.shape[1] // 2
    # closure at the channel outlet (bottom of the grid)
    x = (channel + 0.5) * hdr.cellsize
    y = 0.5 * hdr.cellsize
    basin, bh = extract_basin(dem, hdr, x, y)
    valid = ~np.isclose(basin, hdr.nodata)
    # the whole valley drains to the outlet
    assert valid.sum() > 0.7 * dem.size
    # basin elevations match the DEM where defined
    rows = np.nonzero(valid.any(axis=1))[0]
    assert valid[rows[-1]].any()


def test_clean_basin_excludes_other_valley():
    n = 15
    rows, cols = np.mgrid[0:n, 0:n]
    # two valleys separated by a high ridge at col 7; both drain south
    ridge = 7
    dem = 100.0 + (n - 1 - rows) * 0.5 - np.abs(cols - ridge) * 3.0
    hdr = _header(dem)
    # closure at the bottom of the LEFT valley (col 0)
    x, y = 0.5 * hdr.cellsize, 0.5 * hdr.cellsize
    basin, bh = clean_basin(dem, hdr, x, y)
    # right-valley cells (east of the ridge) are not in the basin raster:
    # the cropped output must not extend past the ridge
    assert bh.ncols <= ridge + 1
    assert (~np.isclose(basin, hdr.nodata)).sum() >= n  # at least the channel
