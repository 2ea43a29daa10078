"""Single-band GeoTIFF IO (the gdalHandler raster-import analogue)."""

import struct

import numpy as np
import pytest

from criteria3d_tpu.io.esri import RasterHeader
from criteria3d_tpu.io.geotiff import (_lzw_decode, _unpackbits,
                                       read_geotiff, write_geotiff)


@pytest.fixture
def header():
    return RasterHeader(nrows=25, ncols=18, xllcorner=650000.0,
                        yllcorner=4900000.0, cellsize=50.0, nodata=-9999.0)


def test_roundtrip(tmp_path, header):
    rng = np.random.default_rng(1)
    data = rng.normal(100.0, 10.0, (25, 18))
    data[0, 0] = -9999.0
    path = str(tmp_path / "dem.tif")
    write_geotiff(path, data, header)
    out, hdr = read_geotiff(path)
    np.testing.assert_allclose(out[1:], data[1:], rtol=1e-6)
    assert out[0, 0] == -9999.0
    assert hdr.nrows == 25 and hdr.ncols == 18
    assert hdr.xllcorner == pytest.approx(650000.0)
    assert hdr.yllcorner == pytest.approx(4900000.0)
    assert hdr.cellsize == pytest.approx(50.0)


def test_reads_big_endian_int16_with_predictor(tmp_path):
    """Hand-built MM-order int16 strip file with horizontal differencing."""
    R, C = 4, 6
    vals = np.arange(R * C, dtype=np.int16).reshape(R, C) * 3 + 100
    diff = vals.copy()
    diff[:, 1:] = vals[:, 1:] - vals[:, :-1]
    pixel = diff.astype(">i2").tobytes()

    def entry(tag, typ, count, val_bytes):
        return struct.pack(">HH", tag, typ) + struct.pack(">I", count) \
            + val_bytes.ljust(4, b"\0")

    n = 10
    ifd_off = 8
    strips_off = ifd_off + 2 + n * 12 + 4
    e = b""
    e += entry(256, 3, 1, struct.pack(">H", C))
    e += entry(257, 3, 1, struct.pack(">H", R))
    e += entry(258, 3, 1, struct.pack(">H", 16))
    e += entry(259, 3, 1, struct.pack(">H", 1))
    e += entry(273, 4, 1, struct.pack(">I", strips_off))
    e += entry(277, 3, 1, struct.pack(">H", 1))
    e += entry(278, 3, 1, struct.pack(">H", R))
    e += entry(279, 4, 1, struct.pack(">I", len(pixel)))
    e += entry(317, 3, 1, struct.pack(">H", 2))
    e += entry(339, 3, 1, struct.pack(">H", 2))
    buf = b"MM" + struct.pack(">H", 42) + struct.pack(">I", ifd_off) \
        + struct.pack(">H", n) + e + struct.pack(">I", 0) + pixel
    path = str(tmp_path / "be.tif")
    with open(path, "wb") as f:
        f.write(buf)
    out, hdr = read_geotiff(path)
    np.testing.assert_array_equal(out, vals.astype(np.float64))


def test_packbits_decoder():
    # literal run of 3, then 4x repeat of 0xAB
    enc = bytes([2, 1, 2, 3, 253, 0xAB])
    assert _unpackbits(enc, 7) == bytes([1, 2, 3]) + bytes([0xAB]) * 4


def test_reads_pil_lzw_and_packbits(tmp_path):
    """Decode LZW and PackBits streams produced by an independent
    implementation (Pillow)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    # low-entropy uint8 image exercises real dictionary growth
    data = (rng.integers(0, 6, (64, 53), dtype=np.uint8) * 7)

    for comp, tag in (("tiff_lzw", "lzw"), ("packbits", "pb")):
        path = str(tmp_path / f"{tag}.tif")
        Image.fromarray(data).save(path, compression=comp)
        out, hdr = read_geotiff(path)
        np.testing.assert_array_equal(out, data.astype(np.float64))

    # float32 + LZW + horizontal predictor
    f32 = rng.normal(50.0, 5.0, (40, 31)).astype(np.float32)
    path = str(tmp_path / "f32.tif")
    Image.fromarray(f32, mode="F").save(path, compression="tiff_lzw")
    out, hdr = read_geotiff(path)
    np.testing.assert_allclose(out, f32.astype(np.float64), rtol=1e-6)


def test_project_loader_reads_tif(tmp_path, header):
    """read_raster dispatches .tif through the GeoTIFF reader."""
    from criteria3d_tpu.io.esri import read_raster
    data = np.full((25, 18), 42.0)
    path = str(tmp_path / "x.tif")
    write_geotiff(path, data, header)
    vals, hdr = read_raster(path)
    assert (vals == 42.0).all()
    assert hdr.cellsize == pytest.approx(50.0)


def test_model_transformation_georef(tmp_path, header):
    """An axis-aligned ModelTransformation (tag 34264) — the alternative
    GDAL output style — must yield the same georeferencing as
    PixelScale+Tiepoint; a rotated matrix must raise."""
    import struct
    from criteria3d_tpu.io.geotiff import _MODEL_PIXEL_SCALE, _MODEL_TIEPOINT

    data = np.arange(12.0, dtype=np.float32).reshape(3, 4)
    path = str(tmp_path / "t.tif")
    write_geotiff(path, data, header)
    raw = bytearray(open(path, "rb").read())

    # rewrite the PixelScale/Tiepoint entries into one ModelTransformation
    n = struct.unpack_from("<H", raw, 8)[0]
    cs = header.cellsize
    top_y = header.yllcorner + 3 * cs
    matrix = struct.pack("<16d", cs, 0, 0, header.xllcorner,
                         0, -cs, 0, top_y, 0, 0, 0, 0, 0, 0, 0, 0)
    off = len(raw)
    raw += matrix
    patched = 0
    for i in range(n):
        e = 10 + i * 12
        tag = struct.unpack_from("<H", raw, e)[0]
        if tag in (_MODEL_PIXEL_SCALE, _MODEL_TIEPOINT) and not patched:
            struct.pack_into("<HHII", raw, e, 34264, 12, 16, off)
            patched += 1
        elif tag in (_MODEL_PIXEL_SCALE, _MODEL_TIEPOINT):
            # overwrite the second entry with a harmless duplicate tag
            struct.pack_into("<HHII", raw, e, 34264 + 1, 3, 1, 0)
    path2 = str(tmp_path / "t2.tif")
    open(path2, "wb").write(bytes(raw))

    out, hdr = read_geotiff(path2)
    np.testing.assert_array_equal(out, data.astype(np.float64))
    assert hdr.cellsize == pytest.approx(cs)
    assert hdr.xllcorner == pytest.approx(header.xllcorner)
    assert hdr.yllcorner == pytest.approx(header.yllcorner)

    # rotated matrix -> hard error, never a silent (0,0)/1.0 grid
    rot = struct.pack("<16d", cs, 0.1, 0, header.xllcorner,
                      0.1, -cs, 0, top_y, 0, 0, 0, 0, 0, 0, 0, 0)
    raw[off:off + len(matrix)] = rot
    path3 = str(tmp_path / "t3.tif")
    open(path3, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="rotated"):
        read_geotiff(path3)


def test_write_long_dimension_tags(tmp_path, header):
    """Width/length/rows-per-strip are written as LONG: a >65535-row raster
    must round-trip (regression: SHORT packing raised struct.error)."""
    R, C = 70000, 3
    data = np.zeros((R, C), dtype=np.float32)
    data[0, 0] = 7.0
    data[-1, -1] = 9.0
    path = str(tmp_path / "tall.tif")
    write_geotiff(path, data, header)
    out, hdr = read_geotiff(path)
    assert out.shape == (R, C)
    assert out[0, 0] == 7.0 and out[-1, -1] == 9.0
