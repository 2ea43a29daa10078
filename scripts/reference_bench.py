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

With ``--fields`` the run becomes a CATCHMENT-SCALE FIELD-PARITY check
(VERDICT r4 next-round item 2): after every simulated hour the per-node
total potential of the reference solve is compared against our solver's
f64 parity path and the fast_f32 production path on the same problem
(real Ravone DEM mask edges + DEM-derived lateral boundary map — the
structures that only appear at scale; the toy-scale parity suites stop
at 48x48 hillslopes).  Results land under ``field_parity`` in
BASELINE_REF.json: per-hour max |dH| for both paths.

Usage:  python scripts/reference_bench.py [coarsen] [hours] [--heat|--fields]
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


def run_ours(grid, params, sink, hours, progress=""):
    """Run our solver for ``hours`` 1-hour periods; return per-hour H
    fields gathered to the reference's node indexing."""
    import dataclasses

    import jax.numpy as jnp

    from criteria3d_tpu import WaterState
    from criteria3d_tpu.solver.step import compute_period, initialize_balance

    state = WaterState.initialize(grid, params, matric_potential=-2.0)
    state = initialize_balance(grid, params, state)
    state = dataclasses.replace(state, sink_source=jnp.asarray(sink))
    fields = []
    for h in range(hours):
        t0 = time.time()
        state = compute_period(grid, params, state, 3600.0)
        fields.append(np.asarray(state.h))
        print(f"  ours{progress} hour {h}: {time.time() - t0:.0f}s",
              flush=True)
    return fields, float(state.balance_whole.mbr)


def field_parity(grid, sink, hours, topo, out, runner, threads):
    """Compare per-node total potential: reference vs f64 vs fast_f32."""
    from criteria3d_tpu import SolverParameters

    mask = np.asarray(grid.mask)
    # parse the reference's per-hour dumps (reference_runner output)
    ref_hours = {}
    current = None
    with open(out) as f:
        for line in f:
            parts = line.split()
            if parts[0] == "HOUR":
                current = int(parts[1])
                ref_hours[current] = np.full(int(mask.sum()), np.nan)
            elif parts[0] not in ("T", "HEATMBR"):
                ref_hours[current][int(parts[0])] = float(parts[1])

    # node-index map: export_topology numbers surface nodes first, then
    # soil nodes, in the same (layer, row, col) scan order both sides use
    from tests.golden.export_topology import node_index_map
    idx = node_index_map(grid)

    result = {}
    for name, params in (
            ("f64", SolverParameters()),
            ("fast_f32", SolverParameters.fast_f32())):
        fields, mbr = run_ours(grid, params, sink, hours,
                               progress=f"[{name}]")
        errs = []
        for h in range(hours):
            ours = fields[h][mask]
            ref = ref_hours[h][idx[mask]]
            errs.append(float(np.abs(ours - ref).max()))
        result[name] = {"max_abs_dh_per_hour_m": errs, "whole_mbr": mbr}
        print(f"  {name}: max|dH| per hour = {errs}", flush=True)
    return result


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    with_heat = "--heat" in sys.argv[1:]
    with_fields = "--fields" in sys.argv[1:]
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
    # surface nodes start DRY, pond = 0 (initializeWaterContent semantics,
    # project3D.cpp:1104-1158) — exactly what WaterState.initialize's
    # surface clamp produces on our side.  Exporting raw -2.0 for surface
    # nodes hands the reference an unphysical 2 m phantom pond DEFICIT
    # (setNodeMatricPotential does not clamp surface H,
    # soilFluxes3D.cpp:842-884): its first step then reports MBR ~ -1.0
    # (rain fills the deficit without entering storage), collapses dt to
    # 1 s, and erases the deficit through the Jacobi surface clamp —
    # nothing the TPU side simulates.  The toy parity cases always did
    # this (tests/test_reference_parity.py:80); the benchmark export
    # missed it until round 5.
    psi0[0] = 0.0
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
    if with_fields:
        print("field parity: running our solver on the same problem ...",
              flush=True)
        result["field_parity"] = field_parity(grid, sink, hours, topo, out,
                                              runner, threads)
    # BASELINE_REF_OUT redirects the artifact (e.g. the soak-tier parity
    # test writes to a tmp path instead of clobbering the committed anchor)
    path = os.environ.get("BASELINE_REF_OUT",
                          os.path.join(REPO, "BASELINE_REF.json"))
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        data = prev if "levels" in prev else {"levels": {str(prev["coarsen"]): prev}}
    else:
        data = {"levels": {}}
    section = ("field_parity" if with_fields else
               "heat_levels" if with_heat else "levels")
    data.setdefault(section, {})[str(coarsen)] = result
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(result))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
