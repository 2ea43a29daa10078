"""Output subsystem tests: variable maps, output points DB, raster export."""

import os
import sqlite3

import numpy as np
import pytest

from criteria3d_tpu import Grid, SoilFields, SolverParameters, WaterState
from criteria3d_tpu.constants import NODATA
from criteria3d_tpu.outputs import (OutputPoints, OutputVariable,
                                    compute_variable_map,
                                    layer_index_for_depth,
                                    write_output_rasters)
from criteria3d_tpu.solver.step import initialize_balance
from tests.test_catchment3d import valley_dem


@pytest.fixture(scope="module")
def setup():
    dem = valley_dem(8)
    soil = SoilFields.uniform(dem.shape, vg_alpha=1.2, vg_n=1.5, vg_he=0.02,
                              theta_s=0.41, theta_r=0.04, k_sat=5e-6)
    grid = Grid.build(dem, 10.0, soil, total_depth=0.6)
    params = SolverParameters()
    state = WaterState.initialize(grid, params, matric_potential=-1.0)
    state = initialize_balance(grid, params, state)
    return grid, params, state


def test_layer_index(setup):
    grid, _, _ = setup
    assert layer_index_for_depth(grid, 1.0) == 1   # 1 cm -> first soil layer
    l40 = layer_index_for_depth(grid, 40.0)
    depths = np.asarray(grid.layer_depth)
    assert abs(depths[l40] - 0.4) < 0.1


def test_variable_maps(setup):
    grid, params, state = setup
    theta = compute_variable_map(grid, params, state,
                                 OutputVariable.VOLUMETRIC_WATER_CONTENT, 2)
    mask = np.asarray(grid.mask[2])
    assert (theta[mask] > 0.04).all() and (theta[mask] < 0.41).all()
    assert (theta[~mask] == NODATA).all()

    psi = compute_variable_map(grid, params, state,
                               OutputVariable.WATER_MATRIC_POTENTIAL, 2)
    np.testing.assert_allclose(psi[mask], -1.0, atol=1e-9)

    fos = compute_variable_map(grid, params, state,
                               OutputVariable.FACTOR_OF_SAFETY, 3)
    assert np.isfinite(fos[mask]).all()


def test_output_points_sqlite(setup, tmp_path):
    grid, params, state = setup
    pts = OutputPoints(ids=["A", "B"], rows=[2, 5], cols=[3, 4])
    db = str(tmp_path / "out.db")
    variables = {OutputVariable.VOLUMETRIC_WATER_CONTENT: [10, 30],
                 OutputVariable.WATER_MATRIC_POTENTIAL: [10]}
    pts.write_hour(db, "2023-05-10T12:00", grid, params, state, variables)
    pts.write_hour(db, "2023-05-10T13:00", grid, params, state, variables)

    con = sqlite3.connect(db)
    rows = con.execute('SELECT * FROM "point_A" ORDER BY time').fetchall()
    assert len(rows) == 2
    cols = [d[0] for d in con.execute('SELECT * FROM "point_A"').description]
    assert "waterContent_10" in cols and "waterPotential_10" in cols
    con.close()


def test_output_rasters(setup, tmp_path):
    grid, params, state = setup
    files = write_output_rasters(
        str(tmp_path), "20230510_H12", grid, params, state,
        {OutputVariable.DEGREE_OF_SATURATION: [20]})
    assert len(files) == 1 and os.path.exists(files[0])
    from criteria3d_tpu.io.esri import read_flt
    data, hdr = read_flt(files[0])
    assert hdr.cellsize == 10.0
    mask = np.asarray(grid.mask[layer_index_for_depth(grid, 20)])
    assert np.isfinite(data[mask]).all()


def test_balance_report(setup):
    from criteria3d_tpu.solver import water as W
    from criteria3d_tpu.utils.telemetry import balance_report
    grid, params, state = setup
    s0 = float(W.total_water_content(grid, params, state.h, state.se))
    rep = balance_report(grid, params, state, initial_storage=s0)
    assert rep["water_content_m3"] == pytest.approx(s0)
    assert abs(rep["mass_balance_error_mm"]) < 1e-6   # nothing happened yet
    assert "runoff_m3" in rep and "free_drainage_m3" in rep
