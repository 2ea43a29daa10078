"""Measure the REFERENCE CPU solver on the Ravone storm-hour benchmark.

Anchors bench.py's ``vs_baseline`` to the actual reference implementation
(VERDICT round-1 item 2): the unmodified agrolib/soilFluxes3D sources are
compiled with OpenMP (tests/golden/build_reference.sh), driven over the SAME
problem bench.py measures (Ravone DEM, 20 mm/h storm, psi0 = -2 m, one
simulated hour, modelAccuracy defaults), and timed.

The container offers 2 CPU cores; the reference's own default thread count
is hardware_concurrency (types.h:314), so 2 OpenMP threads IS the reference
configuration on this machine. Full-resolution Ravone (2.96M nodes) is
prohibitively slow for the reference CPU build here, so the anchor runs on
a coarsened grid (default 4x -> ~185k nodes) and records wall-clock per
node per simulated hour, which bench.py scales against the TPU's
full-resolution number.

Writes BASELINE_REF.json at the repo root:
    {"coarsen": N, "n_nodes": ..., "ref_wall_s_per_hour": ...,
     "ref_threads": 2, "ref_wall_s_per_node_hour": ...}

With ``--heat`` the export additionally enables the reference's coupled
heat process (vapor on, advection off — advection NaNs upstream, see
tests/test_heat_parity.py) under the exact atmospheric forcing bench.py's
coupled leg uses, anchoring ``coupled_heat_wall_s`` and
``coupled_heat_mbr``: results land under ``heat_levels`` in
BASELINE_REF.json as ``ref_coupled_wall_s_per_hour`` and
``ref_whole_period_heat_mbr`` (VERDICT r4 next-round item 3a).

Usage:  python scripts/reference_bench.py [coarsen] [hours] [--heat]
"""

import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the environment may pin JAX to the remote TPU via sitecustomize; the
# export is host-side numpy work, force the CPU platform (see tests/conftest)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    args = [a for a in sys.argv[1:] if a != "--heat"]
    with_heat = "--heat" in sys.argv[1:]
    coarsen = int(args[0]) if len(args) > 0 else 4
    hours = int(args[1]) if len(args) > 1 else 1
    threads = os.cpu_count() or 2

    import bench
    from criteria3d_tpu import SolverParameters
    from tests.golden.export_topology import export_topology

    build_dir = "/tmp/refsolver"
    runner = os.path.join(build_dir, "reference_runner")
    subprocess.run(["bash", os.path.join(REPO, "tests/golden/build_reference.sh"),
                    build_dir], check=True, capture_output=True)

    print(f"building Ravone grid (coarsen={coarsen}) ...", flush=True)
    grid = bench.build_grid(coarsen)
    params = SolverParameters()
    heat_cfg = None
    if with_heat:
        # the same hgrid transform + atmospheric forcing as bench.py's
        # coupled leg: every valid layer-1 node is an atmospheric
        # HeatSurface boundary
        import dataclasses

        import jax.numpy as jnp

        from criteria3d_tpu.core.grid import BoundaryType
        grid = dataclasses.replace(
            grid,
            btype=grid.btype.at[1].set(jnp.where(
                grid.mask[1], int(BoundaryType.HEAT_SURFACE),
                grid.btype[1])),
            bsize=grid.bsize.at[1].set(jnp.where(
                grid.mask[1], float(grid.area), grid.bsize[1])))
        heat_cfg = dict(vapor=1, advection=0, initial_t=288.15,
                        air_t=291.15, rel_humidity=85.0, wind=3.0,
                        net_irradiance=80.0)

    mask = np.asarray(grid.mask)
    z = np.asarray(grid.z)
    psi0 = np.full(mask.shape, -2.0)
    # 20 mm/h storm on the surface (same sink bench.py applies)
    rain = 0.020 * float(np.asarray(grid.area)) / 3600.0
    sink = np.zeros(mask.shape)
    sink[0][mask[0]] = rain

    tag = f"ravone_c{coarsen}" + ("_heat" if with_heat else "")
    topo = os.path.join(build_dir, f"{tag}.topo")
    out = os.path.join(build_dir, f"{tag}.out")
    print(f"exporting topology ({int(mask.sum())} nodes) ...", flush=True)
    t0 = time.time()
    export_topology(topo, grid, psi0, sink, params, hours, heat=heat_cfg)
    print(f"export: {time.time() - t0:.0f}s", flush=True)

    print(f"running reference solver ({threads} threads, {hours}h) ...",
          flush=True)
    proc = subprocess.run([runner, topo, out, str(threads)],
                          capture_output=True, text=True)
    if proc.returncode != 0:
        print(proc.stderr[-2000:])
        sys.exit(1)
    times = [float(m.group(1)) for m in
             re.finditer(r"TIME \d+ ([\d.]+)", proc.stderr)]
    if not times:
        print("no TIME lines in runner output"); sys.exit(1)
    wall = float(np.mean(times))
    n_nodes = grid.n_nodes

    mbr = None
    heat_mbr = None
    with open(out) as f:
        for line in f:
            if line.startswith("HOUR"):
                mbr = float(line.split()[2])
            elif line.startswith("HEATMBR"):
                heat_mbr = float(line.split()[2])

    result = {
        "coarsen": coarsen,
        "n_nodes": n_nodes,
        "hours": hours,
        "ref_wall_s_per_hour": round(wall, 3),
        "ref_threads": threads,
        "ref_wall_s_per_node_hour": wall / n_nodes,
        "ref_node_updates_per_s": round(n_nodes / wall, 1),
        "ref_whole_period_mbr": mbr,
        "ref_build": "agrolib/soilFluxes3D @ v1.3.3, g++ -O2 -fopenmp",
    }
    if with_heat:
        result["ref_coupled_wall_s_per_hour"] = round(wall, 3)
        result["ref_whole_period_heat_mbr"] = heat_mbr
    path = os.path.join(REPO, "BASELINE_REF.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        data = prev if "levels" in prev else {"levels": {str(prev["coarsen"]): prev}}
    else:
        data = {"levels": {}}
    data.setdefault("heat_levels" if with_heat else "levels",
                    {})[str(coarsen)] = result
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(result))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
