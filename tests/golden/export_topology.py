"""Export a criteria3d_tpu Grid + initial condition as a reference-solver
topology file (consumed by reference_runner.cpp), and map node indices.

Ordering contract: surface nodes first (layer 0, row-major), then soil
layers in order — the reference requires surface indices < nrSurfaceNodes
(types.h:256-257).
"""

from __future__ import annotations

import numpy as np

from criteria3d_tpu.core.grid import BoundaryType, Grid, LATERAL_OFFSETS

__all__ = ["export_topology", "node_index_map"]


def node_index_map(grid: Grid) -> np.ndarray:
    """(L,R,C) int array: reference node index, -1 where invalid."""
    mask = np.asarray(grid.mask)
    L, R, C = mask.shape
    idx = np.full((L, R, C), -1, dtype=np.int64)
    counter = 0
    for r in range(R):
        for c in range(C):
            if mask[0, r, c]:
                idx[0, r, c] = counter
                counter += 1
    for l in range(1, L):
        for r in range(R):
            for c in range(C):
                if mask[l, r, c]:
                    idx[l, r, c] = counter
                    counter += 1
    return idx


def export_topology(path: str, grid: Grid, psi0: np.ndarray, sink: np.ndarray,
                    params, hours: int, heat: dict | None = None,
                    schedule: list | None = None) -> np.ndarray:
    """Write the topology file; returns the node index map.

    ``heat`` optionally enables the reference heat process: a dict with
    keys vapor, advection, initial_t, air_t, rel_humidity, wind,
    net_irradiance (+ optional height_wind, height_temperature, roughness).
    Nodes whose ``grid.btype`` is HEAT_SURFACE (8) get the atmospheric heat
    boundary (reference setNodeBoundary* setters).

    Prescribed-potential boundaries (btype 4) export their
    ``grid.prescribed_h`` (PRESC section -> setNodePrescribedTotalPotential)
    and culvert outlets (btype 7) their ``grid.culvert_*`` geometry
    (CULVERTS section -> setCulvert). ``schedule`` is an optional per-hour
    sink multiplier list (SCHEDULE section) for storm-then-drainage soaks.
    """
    mask = np.asarray(grid.mask)
    z = np.asarray(grid.z)
    vol = np.asarray(grid.volume)
    btype = np.asarray(grid.btype)
    bslope = np.asarray(grid.bslope)
    bsize = np.asarray(grid.bsize)
    rough = np.asarray(grid.roughness)
    pond = np.asarray(grid.pond_max)
    soil = grid.soil
    alpha = float(np.asarray(soil.vg_alpha).flat[0])
    vg_n = float(np.asarray(soil.vg_n).flat[0])
    vg_m = float(np.asarray(soil.vg_m).flat[0])
    vg_he = float(np.asarray(soil.vg_he).flat[0])
    theta_r = float(np.asarray(soil.theta_r).flat[0])
    theta_s = float(np.asarray(soil.theta_s).flat[0])
    k_sat = float(np.asarray(soil.k_sat).flat[0])
    mualem_l = float(np.asarray(soil.mualem_l).flat[0])

    L, R, C = mask.shape
    cell = grid.cell_size
    area = float(np.asarray(grid.area))
    lat_area = np.asarray(grid.lat_area).reshape(-1)

    idx = node_index_map(grid)
    n_nodes = int(mask.sum())
    n_surface = int(mask[0].sum())

    # coordinates: cell centres
    xs = (np.arange(C) + 0.5) * cell
    ys = ((R - 1 - np.arange(R)) + 0.5) * cell

    nodes = []
    links = []
    for l in range(L):
        for r in range(R):
            for c in range(C):
                if not mask[l, r, c]:
                    continue
                i = idx[l, r, c]
                is_surf = 1 if l == 0 else 0
                bt = int(btype[l, r, c])
                nodes.append((i, xs[c], ys[r], z[l, r, c], vol[l, r, c],
                              is_surf, bt, bslope[l, r, c], bsize[l, r, c],
                              0, 0, 0, pond[r, c],
                              psi0[l, r, c], sink[l, r, c]))

                # up link
                if l > 0 and idx[l - 1, r, c] >= 0:
                    links.append((i, idx[l - 1, r, c], 0, area))
                # down link
                if l + 1 < L and idx[l + 1, r, c] >= 0:
                    links.append((i, idx[l + 1, r, c], 1, area))
                # lateral links
                for (dr, dc) in LATERAL_OFFSETS:
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < R and 0 <= cc < C and idx[l, rr, cc] >= 0:
                        links.append((i, idx[l, rr, cc], 2, lat_area[l]))

    nodes.sort(key=lambda t: t[0])

    import math
    tol_exp = int(round(-math.log10(params.residual_tolerance)))
    mbr_exp = int(round(-math.log10(params.mbr_threshold)))

    with open(path, "w") as f:
        f.write(f"NODES {n_nodes} {n_surface} 8\n")
        for rec in nodes:
            f.write(" ".join(f"{v:.17g}" if isinstance(v, float) else str(v)
                             for v in rec) + "\n")
        f.write(f"LINKS {len(links)}\n")
        for a, b, t, ar in links:
            f.write(f"{a} {b} {t} {ar:.17g}\n")
        f.write("SOILS 1\n")
        f.write(f"0 0 {alpha:.17g} {vg_n:.17g} {vg_m:.17g} {vg_he:.17g} "
                f"{theta_r:.17g} {theta_s:.17g} {k_sat:.17g} {mualem_l:.17g}\n")
        f.write("SURFACES 1\n")
        f.write(f"0 {float(rough.flat[0]):.17g}\n")
        f.write(f"PARAMS {params.delta_t_min:.17g} {params.delta_t_max:.17g} "
                f"{params.max_iterations} {params.max_approximations} "
                f"{tol_exp} {mbr_exp} {params.lateral_vertical_ratio:.17g}\n")
        f.write(f"HOURS {hours}\n")

        presc_h = np.asarray(grid.prescribed_h)
        presc = [(idx[l, r, c], presc_h[l, r, c])
                 for (l, r, c) in zip(*np.nonzero(
                     mask & (btype == BoundaryType.PRESCRIBED_TOTAL_POTENTIAL)))]
        if presc:
            f.write(f"PRESC {len(presc)}\n")
            for i, v in presc:
                f.write(f"{i} {v:.17g}\n")

        cw = np.asarray(grid.culvert_w)
        ch = np.asarray(grid.culvert_h)
        cr = np.asarray(grid.culvert_rough)
        culverts = [(idx[0, r, c], cr[r, c], bslope[0, r, c], cw[r, c],
                     ch[r, c])
                    for (r, c) in zip(*np.nonzero(
                        mask[0] & (btype[0] == BoundaryType.CULVERT)))]
        if culverts:
            f.write(f"CULVERTS {len(culverts)}\n")
            for i, ro, sl, w, h in culverts:
                f.write(f"{i} {ro:.17g} {sl:.17g} {w:.17g} {h:.17g}\n")

        if schedule is not None:
            f.write(f"SCHEDULE {len(schedule)}\n")
            f.write(" ".join(f"{m:.17g}" for m in schedule) + "\n")

        if heat is not None:
            f.write("HEAT {} {} {:.17g} {:.17g} {:.17g} {:.17g} {:.17g} "
                    "{:.17g} {:.17g} {:.17g}\n".format(
                        int(heat.get("vapor", 0)),
                        int(heat.get("advection", 0)),
                        heat["initial_t"], heat["air_t"],
                        heat["rel_humidity"], heat["wind"],
                        heat["net_irradiance"],
                        heat.get("height_wind", 10.0),
                        heat.get("height_temperature", 2.0),
                        heat.get("roughness", 0.01)))
    return idx
