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


def test_exportpng_quicklook(tmp_path):
    """EXPORTPNG writes a valid PNG with the requested color scale."""
    import struct
    import zlib

    import numpy as np

    from criteria3d_tpu.io.quicklook import classify_colors, write_png_raster

    # the classify() interpolation reproduces the reference's scheme:
    # 256 colors, first key at 0, last key pinned at the tail
    lut = classify_colors("temperature")
    assert lut.shape == (256, 3)
    assert tuple(lut[0]) == (0, 0, 255)
    # 5 keys -> 4 intervals of exactly 64 steps: like the reference's
    # classify(), the tail stays one interpolation step short of the last
    # key color (color.cpp:118-121 only pins a remainder)
    assert np.abs(lut[-1].astype(int) - np.array([128, 0, 128])).max() <= 4
    # a 4-key scale (255 = 3*85) pins its remainder to the last key
    assert tuple(classify_colors("dtm")[-1]) == (224, 224, 224)

    data = np.linspace(0.0, 30.0, 64).reshape(8, 8)
    data[0, 0] = -9999.0
    out = tmp_path / "ql.png"
    rng = write_png_raster(str(out), data, "temperature", nodata=-9999.0)
    assert rng["vmax"] == 30.0
    blob = out.read_bytes()
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", blob[16:24])
    assert w == 8 and h == 8 + 14          # map + legend bar
    # decodable IDAT, nodata pixel transparent
    idat_off = blob.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", blob[idat_off - 8:idat_off - 4])[0]
    raw = zlib.decompress(blob[idat_off:idat_off + idat_len])
    assert raw[1 + 3] == 0                 # first pixel alpha == 0 (nodata)
