"""Device-trace rollup of the coupled water+heat hour (VERDICT r4 item 3b).

Runs one simulated hour of the Ravone storm with the full energy
transport interleaved (bench.py's coupled leg) under ``jax.profiler``,
then rolls the on-device XPlane events up by HLO op, printing the top
cost centres and a coarse bucket split (sweeps vs property/assembly
fusions vs reductions vs loop overhead).  This is the heat-path
counterpart of the water-path trace recorded in BASELINE.md ("An
on-device trace of the CG production hour"), answering whether the
coupled hour is substep-count-bound or fixed-cost-per-substep-bound.

Counters: compute_step_coupled's sub-step totals are derived from the
event occurrence counts of the per-substep fusions.

Usage:  python scripts/trace_coupled.py [coarsen] [trace_dir]
"""

import dataclasses
import glob
import os
import re
import sys
import time
from collections import defaultdict
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

from criteria3d_tpu.utils.jaxcache import machine_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  machine_cache_dir(os.path.join(REPO, ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def build_coupled(coarsen):
    import bench
    from criteria3d_tpu import SolverParameters, WaterState
    from criteria3d_tpu.core.grid import BoundaryType
    from criteria3d_tpu.solver import heat as H
    from criteria3d_tpu.solver.step import initialize_balance

    grid = bench.build_grid(coarsen)
    params = SolverParameters.fast_f32(
        heat_vapor=True,
        heat_frozen_props=os.environ.get("TRACE_FROZEN", "1") == "1")

    @partial(jax.jit, static_argnames=("p",))
    def init_state(g, p):
        state = WaterState.initialize(g, p, matric_potential=-2.0)
        state = initialize_balance(g, p, state)
        rain = 0.020 * g.area / 3600.0
        sink = jnp.zeros_like(state.sink_source)
        sink = sink.at[0].set(jnp.where(g.mask[0], rain, 0.0))
        return dataclasses.replace(state, sink_source=sink)

    hgrid = dataclasses.replace(
        grid,
        btype=grid.btype.at[1].set(jnp.where(
            grid.mask[1], int(BoundaryType.HEAT_SURFACE), grid.btype[1])),
        bsize=grid.bsize.at[1].set(jnp.where(
            grid.mask[1], float(grid.area), grid.bsize[1])))
    hstate = init_state(hgrid, params)

    @partial(jax.jit, static_argnames=("p",))
    def init_heat(g, p, w):
        heat0 = H.initialize_heat(g, 288.15)
        heat0 = dataclasses.replace(
            heat0,
            storage_prev=H.heat_storage(g, p, heat0, w),
            storage_whole=H.heat_storage(g, p, heat0, w))
        boundary = H.HeatBoundary.uniform(
            g.shape[1:], air_temperature=291.15, rel_humidity=85.0,
            wind_speed=3.0, net_irradiance=80.0, mask=g.mask[1])
        return heat0, boundary

    heat0, boundary = init_heat(hgrid, params, hstate)
    return hgrid, params, hstate, heat0, boundary


def rollup(trace_dir):
    """Sum on-device event durations by op name from the xplane dump."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # older/newer TF layouts
        from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane dump found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    by_op = defaultdict(lambda: [0.0, 0])
    total_ps = 0.0
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name not in ("XLA Ops", "Async XLA Ops"):
                continue
            # events on one line nest (while bodies contain their ops);
            # attribute EXCLUSIVE time so control-flow parents don't
            # double-count their children
            evs = sorted(line.events, key=lambda e: (e.offset_ps,
                                                     -e.duration_ps))
            stack = []  # (end_ps, name, child_sum accumulator index)
            excl = []   # per-event exclusive durations, filled on pop
            for ev in evs:
                start, dur = ev.offset_ps, ev.duration_ps
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                while stack and start >= stack[-1][0]:
                    stack.pop()
                if stack:
                    stack[-1][2][0] += dur
                rec = [start + dur, name, [0.0]]
                stack.append(rec)
                excl.append((name, dur, rec[2]))
            for name, dur, child in excl:
                self_ps = max(dur - child[0], 0.0)
                by_op[name][0] += self_ps
                by_op[name][1] += 1
                total_ps += self_ps
    if not by_op:
        print("no device events parsed (plane names:",
              [p.name for p in space.planes], ")")
        return

    # coarse semantic buckets by HLO name
    buckets = defaultdict(float)
    pat = [
        (re.compile(r"^(fusion|loop_|input_fusion)"), "fusions"),
        (re.compile(r"while"), "while-ctrl"),
        (re.compile(r"^(all-reduce|reduce)"), "reductions"),
        (re.compile(r"^(copy|bitcast|tuple|get-tuple)"), "copies/layout"),
        (re.compile(r"^dynamic"), "dyn-slice/update"),
    ]
    for name, (dur, _) in by_op.items():
        for rx, b in pat:
            if rx.search(name):
                buckets[b] += dur
                break
        else:
            buckets["other"] += dur

    total_s = total_ps / 1e12
    print(f"\ndevice total: {total_s:.3f} s across {len(by_op)} distinct ops")
    print("\n-- buckets --")
    for b, dur in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {b:16s} {dur / 1e12:8.3f} s  {100 * dur / total_ps:5.1f}%")
    print("\n-- top 30 ops --")
    top = sorted(by_op.items(), key=lambda kv: -kv[1][0])[:30]
    for name, (dur, cnt) in top:
        print(f"  {dur / 1e12:8.4f} s  x{cnt:<7d} {name[:90]}")


def main():
    coarsen = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/coupled_trace"
    from criteria3d_tpu.solver.coupled import compute_period_coupled

    grid, params, water, heat0, boundary = build_coupled(coarsen)
    print("compiling ...", flush=True)
    t0 = time.time()
    compiled = compute_period_coupled.lower(
        grid, params, water, heat0, boundary, 3600.0).compile()
    print(f"compile: {time.time() - t0:.1f}s", flush=True)

    # warm run (untraced)
    t0 = time.time()
    w, h = compiled(grid, water, heat0, boundary, 3600.0)
    jax.block_until_ready(h.t)
    warm = time.time() - t0
    print(f"warm run: {warm:.2f}s", flush=True)

    jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    w, h = compiled(grid, water, heat0, boundary, 3600.0)
    jax.block_until_ready(h.t)
    wall = time.time() - t0
    jax.profiler.stop_trace()
    print(f"traced run: {wall:.2f}s  (coarsen {coarsen}, "
          f"{grid.n_nodes} nodes)", flush=True)

    rollup(trace_dir)


if __name__ == "__main__":
    main()
