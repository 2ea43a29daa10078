"""Headless visualization (viz/ — the GUI analogue).

Decodes the PNGs the renderers write (our writer emits filter-0 rows,
so the decoder here is exact) and asserts pixel-level properties:
slope-shading direction matches shadowDtmColor
(criteria3DProject.cpp:3384-3389), markers land at georeferenced pixels,
series colors appear in charts, retention curves are monotone.
"""

import struct
import zlib

import numpy as np
import pytest

from criteria3d_tpu.constants import NODATA
from criteria3d_tpu.io.esri import RasterHeader
from criteria3d_tpu.viz import (Canvas, HtmlReport, conductivity_plot,
                                hillshade_rgb, line_chart, render_map,
                                render_surface3d, retention_plot,
                                scatter_chart)
from criteria3d_tpu.viz.canvas import text_size
from criteria3d_tpu.viz.font import GLYPHS, render_text_mask


def decode_png(path) -> np.ndarray:
    """Inverse of io.quicklook.write_png (8-bit RGBA, filter 0 rows)."""
    blob = open(path, "rb").read()
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    pos, w = 8, None
    idat = b""
    while pos < len(blob):
        (length,), tag = struct.unpack(">I", blob[pos:pos + 4]), \
            blob[pos + 4:pos + 8]
        payload = blob[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and ctype == 6
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 1 + 4 * w
    rows = []
    for r in range(h):
        row = raw[r * stride:(r + 1) * stride]
        assert row[0] == 0, "writer only emits filter 0"
        rows.append(np.frombuffer(row[1:], np.uint8).reshape(w, 4))
    return np.stack(rows)


@pytest.fixture()
def hill_dem():
    yy, xx = np.mgrid[:40, :50]
    dem = 100.0 + 30.0 * np.exp(-((yy - 20.0) ** 2 + (xx - 25.0) ** 2)
                                / 150.0)
    dem[:4, :4] = NODATA
    return dem


# ---------------------------------------------------------------- font


def test_font_glyphs_and_text_mask():
    for ch, g in GLYPHS.items():
        assert g.shape == (7, 5), ch
    m = render_text_mask("A1", scale=2)
    assert m.shape == (14, 24)
    assert m.any()
    assert text_size("ABC") == (18, 7)
    # unknown characters fall back to a box, not a crash
    assert render_text_mask("é").any()


# -------------------------------------------------------------- canvas


def test_canvas_primitives_roundtrip(tmp_path):
    cv = Canvas(40, 30)
    cv.line(0, 0, 39, 29, (255, 0, 0), width=1)
    cv.marker(10, 20, (0, 128, 0), size=5, shape="circle")
    cv.text(2, 2, "HI", color=(0, 0, 255))
    p = tmp_path / "c.png"
    cv.save(str(p))
    img = decode_png(p)
    assert img.shape == (30, 40, 4)
    assert tuple(img[0, 0, :3]) == (255, 0, 0)      # line start
    assert tuple(img[29, 39, :3]) == (255, 0, 0)    # line end
    assert (img[..., :3] == (0, 128, 0)).all(-1).any()   # marker fill
    assert (img[..., :3] == (0, 0, 255)).all(-1).any()   # text pixels
    np.testing.assert_array_equal(img, cv.rgba)


def test_canvas_blit_alpha_composite():
    cv = Canvas(10, 10, background=(0, 0, 0, 255))
    tile = np.zeros((4, 4, 4), np.uint8)
    tile[..., 0] = 200
    tile[..., 3] = 128   # half-transparent red
    cv.blit(2, 2, tile)
    r = int(cv.rgba[3, 3, 0])
    assert abs(r - round(200 * 128 / 255)) <= 1
    # clipped blit must not raise
    cv.blit(-2, 8, tile)


# ------------------------------------------------------------- mapview


def test_hillshade_south_faces_brighter(hill_dem):
    """shadowDtmColor: shadow = -cos(aspect)*amp — south slopes (aspect
    180) brighten, north slopes darken (criteria3DProject.cpp:3385)."""
    rgba = hillshade_rgb(hill_dem, 10.0, scale="gray")
    north = rgba[12, 25, :3].astype(int)   # north flank of the hill
    south = rgba[28, 25, :3].astype(int)   # south flank
    assert south.sum() > north.sum()
    # nodata stays transparent
    assert rgba[0, 0, 3] == 0


def test_render_map_overlay_points_legend(hill_dem, tmp_path):
    header = RasterHeader(nrows=40, ncols=50, xllcorner=1000.0,
                          yllcorner=2000.0, cellsize=10.0, nodata=NODATA)
    overlay = np.where(np.isclose(hill_dem, NODATA), NODATA,
                       np.linspace(0, 1, 50)[None, :] * np.ones((40, 1)))
    # station at the cell-center of (row=10, col=30)
    x = 1000.0 + 30.5 * 10.0
    y = 2000.0 + (40 - 10 - 0.5) * 10.0
    cv = render_map(hill_dem, header=header, overlay=overlay,
                    overlay_scale="precipitation",
                    points=[(x, y, "ST1")], title="T", target_width=500)
    p = tmp_path / "m.png"
    cv.save(str(p))
    img = decode_png(p)
    zoom = 500 // 50
    top = 22
    px, py = 30 * zoom, 10 * zoom + top
    # the red station marker is within a couple px of the georeferenced cell
    patch = img[py - 8:py + 9, px - 8:px + 9, :3].astype(int)
    assert (np.abs(patch - np.array([220, 40, 40])).sum(-1) < 30).any()
    # legend bar present in the bottom strip
    assert img[-20:, :, :3].std() > 0


def test_render_map_decimates_large_raster():
    big = np.tile(np.linspace(0, 100, 2000)[None, :], (1500, 1))
    cv = render_map(big, 5.0, target_width=600)
    assert cv.width <= 700


# -------------------------------------------------------------- view3d


def test_view3d_renders_relief(hill_dem, tmp_path):
    cv = render_surface3d(hill_dem, 10.0, width=400, height=300,
                          title="V")
    p = tmp_path / "v.png"
    cv.save(str(p))
    img = decode_png(p)
    # terrain fills a substantial part of the frame
    colored = (img[..., :3] != 255).any(-1).mean()
    assert colored > 0.2
    # top-down (tilt 0) occupies more rows than a shallow oblique
    flat = render_surface3d(hill_dem, 10.0, width=400, height=300,
                            tilt_deg=0.0)
    assert (flat.rgba[..., :3] != 255).any(-1).mean() > colored * 0.5


def test_view3d_overlay_changes_colors(hill_dem):
    base = render_surface3d(hill_dem, 10.0, width=300, height=220)
    ov = np.where(np.isclose(hill_dem, NODATA), NODATA, 5.0)
    over = render_surface3d(hill_dem, 10.0, width=300, height=220,
                            overlay=ov, overlay_scale="surface_water")
    assert (base.rgba != over.rgba).any()


def test_view3d_empty_dem():
    cv = render_surface3d(np.full((5, 5), NODATA), 1.0, width=120,
                          height=90)
    assert cv.width == 120


# -------------------------------------------------------------- charts


def test_line_chart_series_colors_and_nan_breaks():
    import datetime as dt
    t = [dt.datetime(2024, 5, 1) + dt.timedelta(hours=h) for h in range(48)]
    y1 = 15 + 8 * np.sin(np.arange(48) / 24 * 2 * np.pi)
    y2 = np.full(48, 10.0)
    y2[20:30] = np.nan
    cv = line_chart({"T": (t, y1), "D": (t, y2)}, title="M", ylabel="C")
    img = cv.rgba
    assert (img[..., :3] == (31, 119, 180)).all(-1).any()   # series 1
    assert (img[..., :3] == (214, 39, 40)).all(-1).any()    # series 2
    # single-point series and numeric axis also render
    cv2 = line_chart({"P": ([0.0, 1.0, 2.0], [1.0, np.nan, 3.0])})
    assert cv2.rgba.size


def test_scatter_chart_fit_line():
    rng = np.random.default_rng(0)
    x = rng.uniform(100, 900, 50)
    y = 20.0 - 0.0065 * x + rng.normal(0, 0.2, 50)
    cv = scatter_chart(x, y, xlabel="Z", ylabel="T")
    assert (cv.rgba[..., :3] == (214, 39, 40)).all(-1).any()  # fit line


# ------------------------------------------------------------ soilplot


def test_retention_and_conductivity_curves():
    loam = dict(name="LOAM", vg_alpha=3.6, vg_n=1.56, vg_he=0.02,
                theta_s=0.43, theta_r=0.078, k_sat=2.9e-6)
    clay = dict(name="CLAY", vg_alpha=0.8, vg_n=1.09, vg_he=0.05,
                theta_s=0.38, theta_r=0.068, k_sat=5.6e-7)
    cv = retention_plot([loam, clay], lab_points=[(10.0, 0.30)])
    assert (cv.rgba[..., :3] == (31, 119, 180)).all(-1).any()
    assert (cv.rgba[..., :3] == (214, 39, 40)).all(-1).any()
    cv2 = conductivity_plot(loam)
    assert (cv2.rgba[..., :3] == (31, 119, 180)).all(-1).any()


# -------------------------------------------------------------- report


def test_html_report_standalone(tmp_path, hill_dem):
    rep = HtmlReport("Run <x>")
    rep.section("Terrain & maps")
    rep.figure(render_map(hill_dem, 10.0, target_width=200), "map")
    rep.paragraph("MBR < 1e-3 & stable")
    rep.table([["MBR", "1.2e-4"], ["hours", 24]],
              header=["metric", "value"])
    p = tmp_path / "r.html"
    rep.write(str(p))
    txt = p.read_text()
    assert txt.startswith("<!DOCTYPE html>")
    assert "data:image/png;base64," in txt
    assert "Run &lt;x&gt;" in txt            # title escaped
    assert "MBR &lt; 1e-3 &amp; stable" in txt
    assert "<td>1.2e-4</td>" in txt


# ------------------------------------------------------------- animate


def test_apng_structure(tmp_path, hill_dem):
    from criteria3d_tpu.viz import animate_maps, write_apng

    frames = [np.full((8, 6, 4), v, np.uint8) for v in (10, 120, 250)]
    p = tmp_path / "a.png"
    write_apng(str(p), frames, delay_ms=100)
    blob = p.read_bytes()
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    # acTL declares 3 frames; 2 fdAT follow the first IDAT
    i = blob.index(b"acTL")
    nf, loops = struct.unpack(">II", blob[i + 4:i + 12])
    assert (nf, loops) == (3, 0)
    assert blob.count(b"fcTL") == 3 and blob.count(b"fdAT") == 2
    # single frame degrades to a plain PNG
    p2 = tmp_path / "s.png"
    write_apng(str(p2), frames[:1])
    assert b"acTL" not in p2.read_bytes()

    # the map animation keeps one global color range across frames
    rasters = [np.where(np.isclose(hill_dem, NODATA), NODATA, float(v))
               for v in (0.0, 0.5, 1.0)]
    n = animate_maps(str(tmp_path / "m.png"), hill_dem, 10.0, rasters,
                     target_width=120)
    assert n == 3


# ----------------------------------------------------------------- cli


def test_cli_map_view3d_report_chart(tmp_path):
    import datetime as dt
    import subprocess
    import sys

    from criteria3d_tpu.core.meteo import MeteoVariable
    from criteria3d_tpu.io.esri import write_flt
    from criteria3d_tpu.io.meteopoints import MeteoPointsDB

    dem = 100.0 + np.arange(12)[:, None] * 0.5 * np.ones((1, 10))
    write_flt(str(tmp_path / "dem"), dem,
              RasterHeader(nrows=12, ncols=10, xllcorner=0, yllcorner=0,
                           cellsize=10.0, nodata=-9999.0))
    db_path = str(tmp_path / "pts.db")
    with MeteoPointsDB(db_path, create=True) as db:
        db.write_point_properties(id_point="P1", name="One",
                                  latitude=44.5, longitude=11.3,
                                  altitude=50.0)
        db.write_hourly("P1", MeteoVariable.AIR_TEMPERATURE,
                        dt.datetime(2024, 5, 1),
                        15 + 5 * np.sin(np.arange(48) / 24 * 2 * np.pi))
        db.write_point_properties(id_point="P2", name="Two",
                                  latitude=44.6, longitude=11.4,
                                  altitude=420.0)
        db.write_hourly("P2", MeteoVariable.AIR_TEMPERATURE,
                        dt.datetime(2024, 5, 1),
                        12 + 5 * np.sin(np.arange(48) / 24 * 2 * np.pi))
    script = tmp_path / "batch.txt"
    script.write_text(
        f"DEM {tmp_path / 'dem.flt'}\n"
        f"POINT {db_path}\n"
        f"MAP {tmp_path / 'map.png'}\n"
        f"VIEW3D {tmp_path / 'v3d.png'} dem 30 60\n"
        f"CHART P1 {tmp_path / 'chart.png'} AIR_TEMPERATURE\n"
        f"PROXY {tmp_path / 'proxy.png'} AIR_TEMPERATURE 2024-05-01T06\n"
        f"REPORT {tmp_path / 'run.html'}\nEXIT\n")
    out = subprocess.run(
        [sys.executable, "-m", "criteria3d_tpu.cli", str(script)],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": "."})
    assert out.returncode == 0, out.stderr
    for f in ("map.png", "v3d.png", "chart.png", "proxy.png", "run.html"):
        assert (tmp_path / f).exists(), out.stdout
    img = decode_png(tmp_path / "map.png")
    assert img.shape[0] > 12 and img.shape[1] >= 500
