"""Soil-cracking preferential flow.

Vectorised re-implementation of Crit3DProject::computeSoilCracking
(bin/CRITERIA3D/criteria3DProject.cpp:969-1113): in fine-textured dry soils
part of the precipitation bypasses the matrix through shrinkage cracks,
filling the profile's void volume from the bottom of the crack upward; the
remainder stays on the surface.

Returns per-layer sink additions [m3 s-1] plus residual surface water [mm].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from criteria3d_tpu.core.grid import Grid
from criteria3d_tpu.core.soil import theta_from_se
from criteria3d_tpu.core.state import SolverParameters

__all__ = ["soil_cracking"]

MAX_CRACKING_DEPTH = 0.6       # [m]
MIN_FINE_LAYER_DEPTH = 0.2     # [m]
MIN_VOID_VOLUME = 0.15         # [m3 m-3]
MAX_VOID_VOLUME = 0.20
MIN_FINE_FRACTION = 0.5
MAX_STORAGE = 0.05             # [m3 m-3]


def soil_cracking(grid: Grid, params: SolverParameters, se, precipitation_mm,
                  pond_mm, *, fine_fraction=None):
    """(crack_sink [m3 s-1] (L,R,C), residual_surface_water [mm] (R,C)).

    ``fine_fraction``: (R,C) clay+silt/2 fraction of the profile; cells below
    MIN_FINE_FRACTION never crack. Defaults to 0.6 (cracking-prone).
    """
    L, R, C = grid.shape
    prec = jnp.asarray(precipitation_mm, jnp.float64)
    if fine_fraction is None:
        fine_fraction = jnp.full((R, C), 0.6)

    depths = np.asarray(grid.layer_depth)
    thicks = np.asarray(grid.layer_thickness)
    soil_depth = depths[-1] + thicks[-1] * 0.5
    max_depth = min(soil_depth, MAX_CRACKING_DEPTH)

    # crackable layers: centre depth within the fine horizon span
    in_crack = np.zeros(L, bool)
    for l in range(1, L):
        in_crack[l] = depths[l] <= max_depth
    in_crack_j = jnp.asarray(in_crack).reshape(L, 1, 1)
    thick_j = jnp.asarray(thicks).reshape(L, 1, 1)

    theta = theta_from_se(grid.soil, se)
    void = jnp.maximum(grid.soil.theta_s - theta, 0.0)
    void = jnp.where(in_crack_j & grid.mask, void, 0.0)

    crack_depth = jnp.sum(jnp.where(in_crack_j & grid.mask, thick_j, 0.0), axis=0)
    void_sum = jnp.sum(void * thick_j, axis=0)
    avg_void = void_sum / jnp.maximum(crack_depth, 1e-9)

    cracked = (prec > pond_mm) \
        & (fine_fraction >= MIN_FINE_FRACTION) \
        & (avg_void > MIN_VOID_VOLUME) \
        & (crack_depth > 0) \
        & (soil_depth > MIN_FINE_LAYER_DEPTH)

    crack_ratio = jnp.clip((avg_void - MIN_VOID_VOLUME)
                           / (MAX_VOID_VOLUME - MIN_VOID_VOLUME), 0.0, 1.0)
    max_infiltration = prec * crack_ratio
    surface_water = jnp.maximum(prec - max_infiltration, pond_mm)
    potential = jnp.where(cracked, jnp.maximum(prec - surface_water, 0.0), 0.0)

    # fill from the bottom of the crack upward (criteria3DProject.cpp:1085-1109)
    storage_mm = jnp.minimum(void, MAX_STORAGE) * thick_j * 1000.0   # [mm]
    residual = potential
    takes = []
    for l in range(L - 1, 0, -1):
        if not in_crack[l]:
            takes.append((l, None))
            continue
        take = jnp.minimum(storage_mm[l], residual)
        take = jnp.where(cracked & grid.mask[l], take, 0.0)
        residual = residual - take
        takes.append((l, take))

    sink = jnp.zeros((L, R, C))
    for l, take in takes:
        if take is not None:
            sink = sink.at[l].set(grid.area * take / 1000.0 / 3600.0)

    residual_surface = jnp.where(cracked, surface_water + residual, prec)
    return sink, residual_surface
