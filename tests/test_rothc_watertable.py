"""RothC and water-table model tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from criteria3d_tpu.physics.rothc import (RothCState, rmf_temperature,
                                          rmf_plant_cover, rothc_monthly_step)
from criteria3d_tpu.physics.watertable import WaterTableModel, weighted_cwb


SHAPE = (4, 4)


def test_rmf_temperature():
    assert float(rmf_temperature(jnp.float64(-10.0))) == 0.0
    r9 = float(rmf_temperature(jnp.float64(9.25)))
    assert r9 == pytest.approx(1.0, abs=0.05)   # ~1 at 9.25 degC (RothC doc)
    assert float(rmf_temperature(jnp.float64(25.0))) > r9


def test_rmf_plant_cover():
    assert float(rmf_plant_cover(jnp.float64(0.0))) == 1.0
    assert float(rmf_plant_cover(jnp.float64(1.0))) == pytest.approx(0.6)


def test_rothc_decay_and_inputs():
    state = RothCState.initialize(SHAPE, soc_total=60.0)
    soc0 = float(state.soc[0, 0])

    # a warm year with no carbon input: SOC declines
    s = state
    for month in range(12):
        s, diag = rothc_monthly_step(s, temp_c=18.0, monthly_bic=-20.0,
                                     clay_pct=25.0, carbon_input=0.0)
    assert float(s.soc[0, 0]) < soc0
    assert float(diag["co2"][0, 0]) > 0.0

    # with strong carbon input the stock grows instead
    s2 = state
    for month in range(12):
        s2, _ = rothc_monthly_step(s2, temp_c=18.0, monthly_bic=-20.0,
                                   clay_pct=25.0, carbon_input=1.0)
    assert float(s2.soc[0, 0]) > float(s.soc[0, 0])

    # pools stay positive
    for pool in (s.dpm, s.rpm, s.bio, s.hum, s.iom):
        assert (np.asarray(pool) >= 0).all()


def test_rothc_cold_freezes_decomposition():
    state = RothCState.initialize(SHAPE, soc_total=60.0)
    new, diag = rothc_monthly_step(state, temp_c=-10.0, monthly_bic=0.0,
                                   clay_pct=25.0)
    assert float(diag["co2"][0, 0]) == 0.0
    assert float(new.soc[0, 0]) == pytest.approx(float(state.soc[0, 0]))


def test_watertable_fit_and_predict():
    """Synthetic well whose depth follows the weighted CWB exactly."""
    rng = np.random.RandomState(0)
    n = 1200
    prec = rng.gamma(0.6, 5.0, n)
    et0 = 2.0 + 1.5 * np.sin(np.arange(n) / 365.0 * 2 * np.pi)

    true_model = WaterTableModel(h0=150.0, alpha=-1.2, nr_days=180)
    true_model.avg_daily_cwb = float(np.mean(prec - et0))

    obs_idx = np.arange(750, 1150, 30)
    obs = np.array([true_model.depth(prec, et0, i) for i in obs_idx])

    fitted = WaterTableModel()
    assert fitted.fit(prec, et0, obs_idx, obs, step_days=10)
    assert fitted.r2 > 0.9
    # recovered parameters close (window quantised by step)
    assert fitted.alpha == pytest.approx(-1.2, rel=0.3)
    pred = fitted.depth(prec, et0, 1100)
    truth = true_model.depth(prec, et0, 1100)
    assert pred == pytest.approx(truth, abs=10.0)   # [cm]


def test_weighted_cwb_insufficient_data():
    prec = np.ones(50)
    et0 = np.ones(50)
    assert weighted_cwb(prec, et0, 40, 90, 0.0) == -9999.0


def test_well_csv_import(tmp_path):
    """Location + depth CSV import with the reference's error accounting
    (importData.cpp:10-230)."""
    from criteria3d_tpu.physics.watertable import (load_well_depths_csv,
                                                   load_well_locations_csv)

    loc = tmp_path / "wells.csv"
    loc.write_text("ID,utmX,utmY\n"
                   "W1,680000,4950000\n"
                   '"W2", 681000, 4951000\n'
                   "W1,682000,4952000\n"       # repeated id -> wrong
                   "W3,not_a_number,4953000\n")  # bad coord -> wrong
    wells, wrong = load_well_locations_csv(str(loc), utm_zone=32)
    assert [w.id for w in wells] == ["W1", "W2"]
    assert wrong == 2
    assert wells[0].utm_x == 680000.0
    assert 44.0 < wells[0].latitude < 45.5      # lat derived from UTM

    dep = tmp_path / "depths.csv"
    dep.write_text("ID,date,depth\n"
                   "W1,2020-03-01,120\n"
                   "W1,2020-04-01,140\n"
                   "W2,2020-03-01,90\n"
                   "W9,2020-03-01,100\n"        # unknown id -> wrong
                   "W1,2020-05-01,9999\n"       # > max depth -> wrong
                   "W1,bad-date,100\n")         # -> wrong
    wrong = load_well_depths_csv(str(dep), wells)
    assert wrong == 3
    import datetime
    assert wells[0].depths[datetime.date(2020, 4, 1)] == 140.0
    assert len(wells[1].depths) == 1

    # lat/lon header variant
    loc2 = tmp_path / "wells2.csv"
    loc2.write_text("ID,lat,lon\nA,44.8,11.6\n")
    wells2, wrong2 = load_well_locations_csv(str(loc2), utm_zone=32)
    assert wrong2 == 0 and wells2[0].utm_x > 0


def test_project_watertable_subsystem(tmp_path):
    """Project-level waterTableList (VERDICT r2 item 4): import wells,
    fit per-well CWB models against the nearest station's daily series,
    produce a depth map."""
    import datetime

    import jax.numpy as jnp

    from criteria3d_tpu.core.meteo import MeteoStation, MeteoVariable as MV
    from criteria3d_tpu.physics.meteo import et0_hargreaves_daily
    from criteria3d_tpu.physics.watertable import WaterTableModel, weighted_cwb
    from criteria3d_tpu.project import Criteria3DProject
    from criteria3d_tpu.io.config import ProjectConfig

    rng = np.random.default_rng(7)
    n = 900
    d0 = datetime.date(2018, 1, 1)
    doy = np.array([(d0 + datetime.timedelta(days=int(i))).timetuple().tm_yday
                    for i in range(n)])
    tmin = 5.0 + 8.0 * np.sin(2 * np.pi * (doy - 120) / 365) \
        + rng.normal(0, 1.5, n)
    tmax = tmin + 8.0 + rng.normal(0, 1.0, n)
    prec = np.where(rng.random(n) < 0.3, rng.gamma(2.0, 4.0, n), 0.0)
    et0 = np.asarray(et0_hargreaves_daily(0.17, 44.8, doy, tmax, tmin))

    st = MeteoStation(id="S1", name="S1", latitude=44.8, longitude=11.6,
                      utm_x=680500.0, utm_y=4950500.0, altitude=10.0)
    st.daily_d0 = d0
    st.daily = {MV.DAILY_TMIN: tmin, MV.DAILY_TMAX: tmax, MV.DAILY_PREC: prec}

    # synthetic truth: depth = h0 + alpha * CWB(nr_days=180)
    truth = WaterTableModel(h0=150.0, alpha=-1.2, nr_days=180,
                            avg_daily_cwb=float(np.mean(prec - et0)))
    obs_dates, obs_depths = [], []
    for i in range(750, 900, 15):
        x = weighted_cwb(prec, et0, i, 180, truth.avg_daily_cwb)
        obs_dates.append(d0 + datetime.timedelta(days=i))
        obs_depths.append(truth.h0 + truth.alpha * x)

    loc = tmp_path / "wells.csv"
    loc.write_text("ID,utmX,utmY\nW1,680600,4950600\n")
    dep = tmp_path / "depths.csv"
    dep.write_text("ID,date,depth\n" + "\n".join(
        f"W1,{d},{v:.1f}" for d, v in zip(obs_dates, obs_depths)))

    dem = np.full((8, 8), 10.0)
    from criteria3d_tpu.io.esri import RasterHeader
    hdr = RasterHeader(nrows=8, ncols=8, xllcorner=680560.0,
                       yllcorner=4950560.0, cellsize=10.0, nodata=-9999.0)
    prj = Criteria3DProject(config=ProjectConfig(utm_zone=32), dem=dem,
                            header=hdr)
    prj.warnings = []
    prj.stations = [st]
    gx = hdr.xllcorner + (np.arange(8) + 0.5) * 10.0
    gy = hdr.yllcorner + (8 - 0.5 - np.arange(8)) * 10.0
    prj._grid_xy = (jnp.asarray(np.broadcast_to(gx[None], (8, 8))),
                    jnp.asarray(np.broadcast_to(gy[:, None], (8, 8))))

    assert prj.watertable_import_location(str(loc)) == 0
    assert prj.watertable_import_depths(str(dep)) == 0
    fits = prj.watertable_compute()
    assert len(fits) == 1
    well, model, used_st = fits[0]
    assert used_st.id == "S1"
    assert model.r2 > 0.95                      # recovers the synthetic law
    assert abs(model.nr_days - 180) <= 10
    assert model.alpha == pytest.approx(-1.2, rel=0.15)

    dmap = prj.watertable_depth_map(obs_dates[-1])
    assert dmap is not None and dmap.shape == (8, 8)
    # single well -> uniform map equal to the well's estimate, in metres
    assert 0.5 < dmap[4, 4] < 3.0
    est = model.depth(prec, et0, (obs_dates[-1] - d0).days) * 0.01
    # the map path derives latitude from the well's UTM position, the
    # hand-check from the station's nominal latitude -> cm-level agreement
    assert dmap[4, 4] == pytest.approx(est, abs=1e-2)


def test_utility_dbs_roundtrip(tmp_path):
    """waterTableDb + computationUnitsDb analogues (agrolib/utilities,
    SURVEY §2.2 row 19): persisted pre-fitted water-table parameters and
    the CRITERIA-1D computational_units table."""
    from criteria3d_tpu.io.utility_db import (ComputationUnit,
                                              ComputationUnitsDb,
                                              WaterTableParamsDb)

    wdb = WaterTableParamsDb(str(tmp_path / "wt.db"))
    model = WaterTableModel(h0=142.0, alpha=-1.1, nr_days=185,
                            avg_daily_cwb=-0.8, r2=0.93)
    wdb.write("W01", model, lat=44.8, lon=11.6)
    got, lat, lon = wdb.read("W01")
    assert got.h0 == 142.0 and got.alpha == -1.1 and got.nr_days == 185
    assert got.avg_daily_cwb == -0.8
    assert (lat, lon) == (44.8, 11.6)
    with pytest.raises(KeyError, match="Missing waterTable ID"):
        wdb.read("W99")
    # a read-back model predicts (the CRITERIA-1D use: load, not re-fit)
    prec = np.full(400, 2.0)
    et0 = np.full(400, 2.5)
    d = got.depth(prec, et0, 390)
    assert d != -9999.0 and d >= 0.0

    cdb = ComputationUnitsDb(str(tmp_path / "units.db"))
    units = [ComputationUnit(id_case="CASE001", id_crop="MAIZE",
                             id_meteo="S1", id_soil="SOIL7",
                             id_water_table="W01", hectares=12.5,
                             use_water_table=True),
             ComputationUnit(id_case="CASE002", id_crop="WHEAT",
                             id_meteo="S2", id_soil="SOIL3", hectares=4.0)]
    cdb.write_units(units)
    back = cdb.read_units()
    assert [u.id_case for u in back] == ["CASE001", "CASE002"]
    assert back[0].use_water_table and not back[1].use_water_table
    assert back[0].hectares == 12.5 and back[1].id_crop == "WHEAT"
