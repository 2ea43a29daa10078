"""Static grid geometry: the dense masked (layer, row, col) node box.

The reference builds an "unstructured" node graph from a DEM + soil map
(src/project3D/project3D.cpp:941-1103 setCrit3DTopography), but its links are
exactly up/down/8-lateral-neighbour, so the graph is structurally a dense 3-D
box with a validity mask. This module builds that box:

* layer 0 is the surface (node volume = cell area, z = DEM elevation);
* layers 1..L-1 are soil layers with geometric thickness growth
  (project3D.cpp:1568-1661 setSoilLayers/setLayersDepth);
* lateral links carry interface area ``lateralArea * 0.5`` per the reference's
  "conceptual octagon" (project3D.cpp:1083);
* boundary types (Runoff / FreeDrainage / FreeLateralDrainage / Urban / Road /
  PrescribedTotalWaterPotential) become an int8 field plus slope/size fields.

Everything here is build-time (numpy); the result is a frozen pytree of jnp
arrays consumed by the solver.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from criteria3d_tpu.constants import NODATA, EPSILON, DEG_TO_RAD
from criteria3d_tpu.core.soil import SoilFields

__all__ = ["BoundaryType", "Grid", "build_soil_layers", "slope_aspect"]

# Lateral neighbour offsets (di, dj): N, S, W, E then diagonals.
LATERAL_OFFSETS = (
    (-1, 0), (1, 0), (0, -1), (0, 1),
    (-1, -1), (-1, 1), (1, -1), (1, 1),
)


class BoundaryType(enum.IntEnum):
    """Mirrors boundaryType_t (reference types.h:98-99)."""

    NONE = 0
    RUNOFF = 1
    FREE_DRAINAGE = 2
    FREE_LATERAL_DRAINAGE = 3
    PRESCRIBED_TOTAL_POTENTIAL = 4
    URBAN = 5
    ROAD = 6
    CULVERT = 7
    HEAT_SURFACE = 8


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grid:
    """Static geometry + parameters of the 3-D node box.

    Array shapes: ``(L, R, C)`` unless noted. Data fields are jnp arrays
    (traced); meta fields are Python scalars (static under jit).
    """

    # --- geometry ---
    mask: jax.Array                # bool (L,R,C): node exists
    z: jax.Array                   # [m] node elevation (layer centre)
    volume: jax.Array              # [m3] node volume ([m2] area for surface)
    lat_dist3d: jax.Array          # (8,R,C) [m] 3-D distance to lateral nbr
    dz_lat: jax.Array              # (8,R,C) [m] z(nbr) - z (layer-independent)
    lat_dist2d: jax.Array          # (8,1,1) [m] 2-D (plan) distance
    lat_area: jax.Array            # (L,1,1) [m2] lateral link interface area (×0.5 applied)
    vert_dist: jax.Array           # (L,1,1) [m] |z(l-1) - z(l)| distance to layer above
    area: jax.Array                # scalar [m2] cell area

    # --- boundary data (boundaryData_t, types.h:219-249) ---
    btype: jax.Array               # int8 (L,R,C)
    bslope: jax.Array              # (L,R,C) [m/m]
    bsize: jax.Array               # (L,R,C) [m2] ([m] for surface runoff)
    prescribed_h: jax.Array        # (L,R,C) [m] total potential for Prescribed BC

    # --- per-node material properties ---
    soil: SoilFields               # (L,R,C) dense soil parameters
    roughness: jax.Array           # (R,C) [s m-1/3] surface Manning roughness
    pond_max: jax.Array            # (R,C) [m] surface pond height

    # --- culvert geometry (culvertData_t, types.h:154-160; zero = none) ---
    culvert_w: jax.Array           # (R,C) [m] culvert width
    culvert_h: jax.Array           # (R,C) [m] culvert height
    culvert_rough: jax.Array       # (R,C) [s m-1/3] culvert Manning roughness

    # --- static metadata ---
    # which boundary types exist (trace-time knowledge: lets the assembly
    # skip the full-field prescribed/culvert conductance math — several
    # transcendental passes per Picard iteration — on grids without them)
    has_prescribed: bool = dataclasses.field(metadata=dict(static=True))
    has_culvert: bool = dataclasses.field(metadata=dict(static=True))
    cell_size: float = dataclasses.field(metadata=dict(static=True))
    n_layers: int = dataclasses.field(metadata=dict(static=True))
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_surface_nodes: int = dataclasses.field(metadata=dict(static=True))
    layer_depth: tuple = dataclasses.field(metadata=dict(static=True))
    layer_thickness: tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return self.mask.shape

    @property
    def surface_mask(self):
        return self.mask[0]

    def astype(self, dtype) -> "Grid":
        """Cast all floating-point fields (e.g. to float32 for the
        mixed-precision fast mode, SolverParameters.fast_f32)."""
        def cast(a):
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
                return a.astype(dtype)
            return a
        return jax.tree.map(cast, self)

    def set_culvert(self, row: int, col: int, *, roughness: float,
                    slope: float, width: float, height: float) -> "Grid":
        """Mark the surface node (row, col) as a culvert outlet.

        Mirrors soilFluxes3D::setCulvert (soilFluxes3D.cpp:551-589): the
        boundary becomes Culvert with boundarySlope = slope and
        boundarySize = width*height; the culvert geometry feeds the
        open-channel / mixed / pressure-flow rating in
        :func:`criteria3d_tpu.solver.water.update_boundary_water`
        (water.cpp:749-795).
        """
        return dataclasses.replace(
            self,
            btype=self.btype.at[0, row, col].set(BoundaryType.CULVERT),
            bslope=self.bslope.at[0, row, col].set(slope),
            bsize=self.bsize.at[0, row, col].set(width * height),
            culvert_w=self.culvert_w.at[row, col].set(width),
            culvert_h=self.culvert_h.at[row, col].set(height),
            culvert_rough=self.culvert_rough.at[row, col].set(roughness),
            has_culvert=True,
        )

    def set_prescribed(self, layer: int, row: int, col: int,
                       total_potential: float,
                       boundary_size: float | None = None) -> "Grid":
        """Mark node (layer, row, col) as a prescribed-total-potential
        boundary (soilFluxes3D.cpp setPrescribedTotalPotential analogue).

        Flips ``has_prescribed`` alongside ``btype`` so the trace-time gate
        that elides the prescribed-boundary conductance math stays
        consistent — setting btype via ``dataclasses.replace`` alone would
        silently zero the boundary rate. ``boundary_size`` is the boundary
        face area [m2] (the reference's setNode boundarySize argument);
        default = the cell area, matching the bottom free-drainage face.
        Without it a node whose Grid.build left bsize at 0 (e.g. the bottom
        layer with ``free_bottom_drainage=False``) would carry an inert
        boundary: btype set but zero flux.
        """
        if boundary_size is None:
            boundary_size = float(self.area)
        return dataclasses.replace(
            self,
            btype=self.btype.at[layer, row, col].set(
                BoundaryType.PRESCRIBED_TOTAL_POTENTIAL),
            bsize=self.bsize.at[layer, row, col].set(boundary_size),
            prescribed_h=self.prescribed_h.at[layer, row, col].set(
                total_potential),
            has_prescribed=True,
        )

    # ------------------------------------------------------------------
    @staticmethod
    def build(dem: np.ndarray,
              cell_size: float,
              soil: SoilFields,
              *,
              total_depth: float = 1.0,
              min_thickness: float = 0.02,
              max_thickness: float = 0.1,
              max_thickness_depth: float = 0.4,
              soil_depth_map: np.ndarray | None = None,
              roughness: np.ndarray | float = 0.05,
              pond_max: np.ndarray | float = 0.002,
              land_use: np.ndarray | None = None,
              free_catchment_runoff: bool = True,
              free_bottom_drainage: bool = True,
              free_lateral_drainage: bool = True,
              dtype=jnp.float64) -> "Grid":
        """Construct the node box from a DEM.

        ``dem`` is (R, C) float with NODATA for missing cells. ``soil`` must
        already have shape (L, R, C) for the layer structure implied by the
        thickness parameters — use :func:`build_soil_layers` to get L first,
        or pass a (R, C)-shaped SoilFields to be broadcast over layers.

        Mirrors Project3D::initialize3DModel (project3D.cpp:456-616).
        """
        dem = np.asarray(dem, dtype=np.float64)
        R, C = dem.shape
        valid2d = ~np.isclose(dem, NODATA)

        depths, thicknesses = build_soil_layers(
            total_depth, min_thickness, max_thickness, max_thickness_depth)
        L = len(depths)

        # --- per-layer mask ---
        mask = np.zeros((L, R, C), dtype=bool)
        mask[0] = valid2d
        if soil_depth_map is None:
            soil_depth_map = np.full((R, C), total_depth)
        for l in range(1, L):
            # isWithinSoil: layer exists while its (upper) depth is inside the soil
            mask[l] = valid2d & (depths[l] <= soil_depth_map + 1e-12)
        if land_use is not None:
            # ROAD has no subsurface (project3D.cpp:795)
            road = land_use == BoundaryType.ROAD
            mask[1:] &= ~road[None]

        # --- geometry ---
        area = cell_size * cell_size
        z = np.where(valid2d, dem, 0.0)[None] - np.asarray(depths)[:, None, None]
        z = np.where(mask, z, 0.0)
        volume = np.empty((L, R, C))
        volume[0] = area
        for l in range(1, L):
            volume[l] = area * thicknesses[l]
        volume = np.where(mask, volume, 0.0)

        # lateral interface: cellSize (surface) or cellSize*thickness, ×0.5
        lat_area = np.empty((L,))
        lat_area[0] = cell_size * 0.5
        for l in range(1, L):
            lat_area[l] = cell_size * thicknesses[l] * 0.5

        vert_dist = np.zeros((L,))
        for l in range(1, L):
            vert_dist[l] = depths[l] - depths[l - 1]

        # lateral distances (layer independent: z(l) = dem - depth(l))
        lat_dist2d = np.array([cell_size * math.hypot(di, dj)
                               for (di, dj) in LATERAL_OFFSETS])
        lat_dist3d = np.empty((8, R, C))
        dz_lat = np.zeros((8, R, C))
        zdem = np.where(valid2d, dem, 0.0)
        for k, (di, dj) in enumerate(LATERAL_OFFSETS):
            zn = _np_shift(zdem, di, dj)
            dz = zdem - zn
            lat_dist3d[k] = np.sqrt(lat_dist2d[k] ** 2 + dz ** 2)
            # z(nbr)-z, zeroed where either side is missing (the matching
            # conductance is zero there, so the b-term contribution is too)
            vn = _np_shift(valid2d.astype(np.float64), di, dj) > 0
            dz_lat[k] = np.where(valid2d & vn, -dz, 0.0)

        # --- slope / aspect / runoff boundary ---
        slope_deg, aspect_deg = slope_aspect(dem, cell_size)
        bslope2d = np.tan(slope_deg * DEG_TO_RAD)
        runoff_bnd = _boundary_runoff_mask(dem, valid2d, aspect_deg)

        # --- boundary assignment (setCrit3DTopography, project3D.cpp:963-1036) ---
        btype = np.zeros((L, R, C), dtype=np.int8)
        bslope = np.zeros((L, R, C))
        bsize = np.zeros((L, R, C))

        # surface: runoff boundary
        if free_catchment_runoff:
            sel = mask[0] & runoff_bnd
            btype[0][sel] = BoundaryType.RUNOFF
            bslope[0][sel] = bslope2d[sel]
            bsize[0][sel] = cell_size

        for l in range(1, L):
            is_last = (l == L - 1)
            below = mask[l + 1] if not is_last else np.zeros((R, C), bool)
            bottom = mask[l] & ~below
            if free_bottom_drainage:
                btype[l][bottom] = BoundaryType.FREE_DRAINAGE
                bsize[l][bottom] = area
            # intermediate nodes on the catchment rim drain laterally
            mid = mask[l] & below
            if free_lateral_drainage:
                sel = mid & runoff_bnd
                btype[l][sel] = BoundaryType.FREE_LATERAL_DRAINAGE
                bslope[l][sel] = bslope2d[sel]
                bsize[l][sel] = cell_size * thicknesses[l]
            if land_use is not None and l == 1:
                road = mask[l] & (land_use == BoundaryType.ROAD)
                urban = mask[l] & (land_use == BoundaryType.URBAN)
                btype[l][road] = BoundaryType.ROAD
                btype[l][urban] = BoundaryType.URBAN

        # --- soil broadcast ---
        if soil.vg_alpha.ndim == 2:
            soil = jax.tree.map(
                lambda a: jnp.broadcast_to(jnp.asarray(a, dtype), (L, R, C)), soil)

        rough2d = np.broadcast_to(np.asarray(roughness, dtype=np.float64), (R, C))
        pond2d = np.broadcast_to(np.asarray(pond_max, dtype=np.float64), (R, C))

        n_nodes = int(mask.sum())
        n_surface = int(mask[0].sum())

        j = lambda a: jnp.asarray(a, dtype)
        return Grid(
            mask=jnp.asarray(mask),
            z=j(z), volume=j(volume),
            lat_dist3d=j(lat_dist3d),
            dz_lat=j(dz_lat),
            lat_dist2d=j(lat_dist2d).reshape(8, 1, 1),
            lat_area=j(lat_area).reshape(L, 1, 1),
            vert_dist=j(vert_dist).reshape(L, 1, 1),
            area=j(area),
            btype=jnp.asarray(btype),
            bslope=j(bslope), bsize=j(bsize),
            prescribed_h=j(np.zeros((L, R, C))),
            soil=soil,
            roughness=j(rough2d), pond_max=j(pond2d),
            culvert_w=j(np.zeros((R, C))), culvert_h=j(np.zeros((R, C))),
            culvert_rough=j(np.zeros((R, C))),
            has_prescribed=bool(
                (btype == BoundaryType.PRESCRIBED_TOTAL_POTENTIAL).any()),
            has_culvert=False,
            cell_size=float(cell_size),
            n_layers=L, n_nodes=n_nodes, n_surface_nodes=n_surface,
            layer_depth=tuple(depths), layer_thickness=tuple(thicknesses),
        )


# ----------------------------------------------------------------------
# build-time helpers (numpy)
# ----------------------------------------------------------------------

def build_soil_layers(total_depth: float,
                      min_thickness: float = 0.02,
                      max_thickness: float = 0.1,
                      max_thickness_depth: float = 0.4,
                      ) -> tuple[tuple[float, ...], tuple[float, ...]]:
    """Layer centre depths and thicknesses with geometric growth.

    Exactly reproduces Project3D::setSoilLayers + setLayersDepth
    (project3D.cpp:1568-1661): layer 0 is the surface (zero thickness),
    layer 1 has ``min_thickness``, thickness then grows by a fitted factor
    until ``max_thickness``; the last layer absorbs the remainder.
    """
    if total_depth <= 0:
        return (0.0,), (0.0,)

    # fit growth factor so max thickness is reached at ~max_thickness_depth
    if min_thickness == max_thickness:
        growth = 1.0
    else:
        best_factor, best_err = 1.01, 99.0
        factor = 1.01
        while factor <= 2.0:
            upper, thick = 0.0, min_thickness
            depth = upper + thick * 0.5
            while thick < max_thickness:
                upper += thick
                thick = min(thick * factor, max_thickness)
                depth = upper + thick * 0.5
            err = abs(depth - max_thickness_depth)
            if err < best_err:
                best_err, best_factor = err, factor
            factor += 0.01
        growth = best_factor

    n_layers = 2
    thick, lower = min_thickness, min_thickness
    while (total_depth - lower) > min_thickness:
        n_layers += 1
        thick = min(thick * growth, max_thickness)
        lower += thick

    depths = [0.0] * n_layers
    thicknesses = [0.0] * n_layers
    if n_layers > 1:
        thicknesses[1] = min_thickness
        depths[1] = min_thickness * 0.5
        current = min_thickness
        for i in range(2, n_layers):
            if i == n_layers - 1:
                thicknesses[i] = total_depth - current
            else:
                thicknesses[i] = min(max_thickness, thicknesses[i - 1] * growth)
            depths[i] = current + thicknesses[i] * 0.5
            current += thicknesses[i]
    return tuple(depths), tuple(thicknesses)


def _np_shift(x: np.ndarray, di: int, dj: int, fill=0.0) -> np.ndarray:
    """y[i, j] = x[i+di, j+dj], `fill` outside."""
    y = np.full_like(x, fill)
    src_r = slice(max(di, 0), x.shape[0] + min(di, 0))
    dst_r = slice(max(-di, 0), x.shape[0] + min(-di, 0))
    src_c = slice(max(dj, 0), x.shape[1] + min(dj, 0))
    dst_c = slice(max(-dj, 0), x.shape[1] + min(-dj, 0))
    y[dst_r, dst_c] = x[src_r, src_c]
    return y


def slope_aspect(dem: np.ndarray, cell_size: float) -> tuple[np.ndarray, np.ndarray]:
    """Slope [deg] and aspect [deg, 0=N clockwise] of a DEM with nodata.

    Interior cells use Horn's 3×3 derivatives (gis.cpp:1190-1257); cells with
    a nodata neighbour use the reference's nodata-robust masked-difference
    variant (gis.cpp:1100-1186 computeSlopeAspectBoundary).
    """
    valid = ~np.isclose(dem, NODATA)
    z = np.where(valid, dem, 0.0)

    def nb(di, dj):
        return (_np_shift(z, di, dj), _np_shift(valid.astype(np.float64), di, dj))

    # Horn derivatives (z1..z9 layout: rows -1..1, cols -1..1)
    z1, _ = nb(-1, -1); z2, _ = nb(-1, 0); z3, _ = nb(-1, 1)
    z4, _ = nb(0, -1); z6, _ = nb(0, 1)
    z7, _ = nb(1, -1); z8, _ = nb(1, 0); z9, _ = nb(1, 1)
    dzdx_h = ((z3 + 2 * z6 + z9) - (z1 + 2 * z4 + z7)) / (8.0 * cell_size)
    dzdy_h = ((z7 + 2 * z8 + z9) - (z1 + 2 * z2 + z3)) / (8.0 * cell_size)
    flat_h = (np.abs(dzdx_h) < EPSILON) & (np.abs(dzdy_h) < EPSILON)
    slope_h = np.degrees(np.arctan(np.hypot(dzdx_h, dzdy_h)))
    aspect_h = 90.0 - np.degrees(np.arctan2(dzdy_h, -dzdx_h))
    aspect_h = np.where(aspect_h < 0, aspect_h + 360.0, aspect_h)
    slope_h = np.where(flat_h, 0.0, slope_h)
    aspect_h = np.where(flat_h, 0.0, aspect_h)

    # nodata-robust variant for rim cells
    dz_y = np.zeros_like(z); dy = np.zeros_like(z)
    dz_x = np.zeros_like(z); dx = np.zeros_like(z)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            zn, vn = nb(di, dj)
            if di != 0:
                dz_y += np.where(vn > 0, di * (z - zn), 0.0)
                dy += np.where(vn > 0, cell_size, 0.0)
            if dj != 0:
                dz_x += np.where(vn > 0, dj * (z - zn), 0.0)
                dx += np.where(vn > 0, cell_size, 0.0)
    dzdy_b = dz_y / np.maximum(dy, EPSILON)
    dzdx_b = dz_x / np.maximum(dx, EPSILON)
    slope_b = np.degrees(np.arctan(np.hypot(dzdx_b, dzdy_b)))
    aspect_b = 90.0 - np.degrees(np.arctan2(-dzdy_b, dzdx_b))
    aspect_b = np.where(aspect_b < 0, aspect_b + 360.0, aspect_b)

    n_valid_nb = sum(_np_shift(valid.astype(np.float64), di, dj)
                     for (di, dj) in LATERAL_OFFSETS)
    is_rim = valid & (n_valid_nb < 8)

    slope = np.where(is_rim, slope_b, slope_h)
    aspect = np.where(is_rim, aspect_b, aspect_h)
    slope = np.where(valid, slope, NODATA)
    aspect = np.where(valid, aspect, NODATA)
    return slope, aspect


def _boundary_runoff_mask(dem: np.ndarray, valid: np.ndarray,
                          aspect_deg: np.ndarray) -> np.ndarray:
    """Cells whose downhill (aspect) neighbour leaves the catchment.

    Reference: gis::isBoundaryRunoff (gis.cpp:1452-1488): the cell must sit on
    the DEM rim (a nodata neighbour), and either be a strict local minimum or
    have its aspect-facing neighbour outside the grid.
    """
    R, C = dem.shape
    z = np.where(valid, dem, np.inf)

    n_valid_nb = np.zeros((R, C))
    strict_min = np.ones((R, C), dtype=bool)
    for (di, dj) in LATERAL_OFFSETS:
        vn = _np_shift(valid.astype(np.float64), di, dj) > 0
        zn = _np_shift(z, di, dj, fill=np.inf)
        n_valid_nb += vn
        strict_min &= np.where(vn, z < zn, True)
    is_rim = valid & (n_valid_nb < 8)

    # aspect-facing neighbour offsets
    a = aspect_deg
    r_off = np.where((a >= 135) & (a <= 225), 1,
                     np.where((a <= 45) | (a >= 315), -1, 0))
    c_off = np.where((a >= 45) & (a <= 135), 1,
                     np.where((a >= 225) & (a <= 315), -1, 0))

    rows, cols = np.mgrid[0:R, 0:C]
    tr = rows + r_off
    tc = cols + c_off
    inside = (tr >= 0) & (tr < R) & (tc >= 0) & (tc < C)
    target_valid = np.zeros((R, C), dtype=bool)
    target_valid[inside] = valid[tr[inside], tc[inside]]
    aspect_ok = ~np.isclose(aspect_deg, NODATA) & ~target_valid

    return is_rim & (strict_min | aspect_ok)
