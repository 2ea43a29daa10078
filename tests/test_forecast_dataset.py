"""importDataset analogue: forecast CSV container."""

import datetime

import numpy as np

from criteria3d_tpu.constants import NODATA
from criteria3d_tpu.io.forecast_dataset import ForecastDataset


def test_import_roundtrip(tmp_path):
    path = tmp_path / "forecast.csv"
    rows = []
    for day in (1, 2):
        for hour in range(24):
            rows.append(f"44.5,11.3,55.0,TAVG,2023,7,{day},{hour},"
                        f"{20 + hour * 0.1 + day}")
            rows.append(f"44.5,11.3,55.0,PREC,2023,7,{day},{hour},0.0")
    path.write_text("\n".join(rows) + "\n")

    ds = ForecastDataset()
    n = ds.import_file(str(path))
    assert n == 96
    d1, d2 = datetime.date(2023, 7, 1), datetime.date(2023, 7, 2)
    assert ds.dates() == [d1, d2]
    pt = ds.points(d1)[0]
    assert pt == (44.5, 11.3, 55.0)
    t = ds.hourly_values(d1, pt, "TAVG")
    assert t[0] == 21.0
    assert t[23] == 21.0 + 23 * 0.1
    # hour-0 rollover: day-2 hour 0 copied to day-1 hour 24
    assert t[24] == 22.0
    assert ds.point_index(d1, 44.5, 11.3, 55.0) == 0
    assert ds.point_index(d1, 0, 0, 0) == -1
    # missing var stays NODATA
    assert (ds.hourly_values(d2, pt, "RAD") == NODATA).all()
