"""Console-shell batch mode (the reference's shell.h command set)."""

import subprocess
import sys

import numpy as np

from criteria3d_tpu.io.esri import RasterHeader, write_flt


def test_batch_dem_init_run_fast(tmp_path):
    dem = 100.0 + np.arange(12)[:, None] * 0.5 * np.ones((1, 10))
    write_flt(str(tmp_path / "dem"), dem,
              RasterHeader(nrows=12, ncols=10, xllcorner=0, yllcorner=0,
                           cellsize=10.0, nodata=-9999.0))
    script = tmp_path / "batch.txt"
    script.write_text(
        f"FAST ON\nDEM {tmp_path / 'dem.flt'}\nINIT\nRUN 2 5\nINFO\nEXIT\n")
    out = subprocess.run(
        [sys.executable, "-m", "criteria3d_tpu.cli", str(script)],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": "."})
    assert out.returncode == 0, out.stderr
    assert "fast mode: ON" in out.stdout
    assert "3D model initialized" in out.stdout
    assert "hour 1: MBR=" in out.stdout
    assert "total water content" in out.stdout
