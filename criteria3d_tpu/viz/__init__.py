"""Headless visualization — the framework's GUI analogue.

The reference ships a Qt GUI (bin/CRITERIA3D mainwindow + mapGraphics
canvas, an OpenGL 3-D terrain viewer — glWidget.cpp/viewer3d.cpp/
geometry.cpp — and qcustomplot-based meteo/soil/proxy chart widgets).
This package provides the same *capabilities* headlessly, with zero
dependencies beyond numpy + stdlib zlib: every renderer composes RGBA
arrays on a :class:`~criteria3d_tpu.viz.canvas.Canvas` and writes PNG
through :func:`criteria3d_tpu.io.quicklook.write_png`.

===============  =====================================================
module           reference analogue
===============  =====================================================
``canvas``       QPainter-ish RGBA raster canvas + 5x7 bitmap font
``mapview``      mapGraphics raster canvas (RasterObject + hillshade
                 slope shading, station markers, legend)
``view3d``       bin/CRITERIA3D 3-D viewer (geometry.cpp triangle mesh,
                 shadowDtmColor slope shading, rotation + magnify)
``charts``       meteoWidget / proxyWidget time-series & scatter plots
``soilplot``     soilWidget water-retention / conductivity curves
``report``       standalone HTML run report (data-URI PNGs)
===============  =====================================================
"""

from criteria3d_tpu.viz.canvas import Canvas, text_size
from criteria3d_tpu.viz.mapview import hillshade_rgb, render_map
from criteria3d_tpu.viz.view3d import render_surface3d
from criteria3d_tpu.viz.charts import line_chart, scatter_chart
from criteria3d_tpu.viz.soilplot import retention_plot, conductivity_plot
from criteria3d_tpu.viz.report import HtmlReport
from criteria3d_tpu.viz.animate import animate_maps, write_apng

__all__ = [
    "Canvas", "text_size", "hillshade_rgb", "render_map",
    "render_surface3d", "line_chart", "scatter_chart",
    "retention_plot", "conductivity_plot", "HtmlReport",
    "animate_maps", "write_apng",
]
