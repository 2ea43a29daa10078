"""Native C++ runtime components (criteria3d_tpu/native).

The async raster writer compiles on first use with the in-tree g++ and
must produce byte-identical .flt/.hdr files to the synchronous numpy
writer; with no native library everything silently degrades to sync.
"""

import os

import numpy as np
import pytest

from criteria3d_tpu.io.esri import RasterHeader, read_flt, write_flt
from criteria3d_tpu.native import AsyncRasterWriter, native_available


@pytest.fixture(scope="module")
def header():
    return RasterHeader(nrows=40, ncols=30, xllcorner=1000.0,
                        yllcorner=2000.0, cellsize=25.0, nodata=-9999.0)


def test_native_builds():
    assert native_available(), "g++ is in the image; the build must succeed"


def test_async_writer_matches_sync(tmp_path, header):
    rng = np.random.default_rng(0)
    grids = [rng.normal(size=(40, 30)).astype(np.float32) for _ in range(8)]

    with AsyncRasterWriter(n_threads=3) as w:
        assert w.is_native
        for i, g in enumerate(grids):
            w.submit(str(tmp_path / f"async_{i}"), g, header)
        w.flush()
        assert w.written == 8
        assert w.errors == 0

    for i, g in enumerate(grids):
        write_flt(str(tmp_path / f"sync_{i}"), g, header)
        a, ha = read_flt(str(tmp_path / f"async_{i}.flt"))
        s, hs = read_flt(str(tmp_path / f"sync_{i}.flt"))
        np.testing.assert_array_equal(a, s)
        assert ha == hs
        # byte-identical payloads
        with open(tmp_path / f"async_{i}.flt", "rb") as f1, \
                open(tmp_path / f"sync_{i}.flt", "rb") as f2:
            assert f1.read() == f2.read()


def test_submit_does_not_retain_caller_buffer(tmp_path, header):
    """The queue copies the data: mutating the array after submit must not
    corrupt the written file."""
    data = np.full((40, 30), 7.0, np.float32)
    with AsyncRasterWriter(n_threads=1) as w:
        w.submit(str(tmp_path / "buf"), data, header)
        data[:] = -1.0
        w.flush()
    out, _ = read_flt(str(tmp_path / "buf.flt"))
    assert (out == 7.0).all()


def test_write_output_rasters_with_writer(tmp_path):
    """write_output_rasters(writer=...) drains through the native pool."""
    import jax.numpy as jnp

    from criteria3d_tpu import Grid, SoilFields, SolverParameters, WaterState
    from criteria3d_tpu.outputs import OutputVariable, write_output_rasters
    from criteria3d_tpu.solver.step import initialize_balance

    dem = np.full((6, 6), 50.0)
    soil = SoilFields.uniform(dem.shape, vg_alpha=1.2, vg_n=1.5, vg_he=0.02,
                              theta_s=0.41, theta_r=0.04, k_sat=5e-6)
    grid = Grid.build(dem, 5.0, soil, total_depth=0.3)
    params = SolverParameters()
    water = WaterState.initialize(grid, params, matric_potential=-1.0)
    water = initialize_balance(grid, params, water)

    with AsyncRasterWriter() as w:
        paths = write_output_rasters(
            str(tmp_path), "20230601_H10", grid, params, water,
            {OutputVariable.DEGREE_OF_SATURATION: [10]}, writer=w)
        w.flush()
    assert len(paths) == 1
    assert os.path.exists(paths[0])
    vals, _ = read_flt(paths[0])
    m = np.asarray(grid.mask[0])
    assert np.isfinite(vals[m]).all()
    assert (vals[m] > 0).all() and (vals[m] <= 1.0).all()
