"""Console shell / batch interface.

The TPU analogue of the reference's console shell and batch mode
(agrolib/project/shell.h, Crit3DProject::criteria3DShell / criteria3DBatch /
executeCriteria3DCommand, bin/CRITERIA3D/criteria3DProject.cpp:3518-3713).

Commands (case-insensitive, a subset growing toward the reference's set):

    PROJ <path.ini>          load a project ini
    DEM <path.flt>           load a DEM directly
    INITIALIZE               build the 3-D grid + initial state
    RUN <hours> [rain_mmh]   run N hours of the model cycle
    STATE SAVE <dir>         checkpoint the model state
    STATE LOAD <dir>         restore a checkpoint
    INFO                     grid/state summary
    VERSION                  print version
    QUIT / EXIT              leave the shell

Batch mode: ``python -m criteria3d_tpu.cli script.txt`` executes one command
per line ('#' comments), like the reference's batch files.
"""

from __future__ import annotations

import shlex
import sys

import numpy as np

import criteria3d_tpu
from criteria3d_tpu.constants import NODATA

PROMPT = "criteria3d-tpu> "


class Shell:
    def __init__(self):
        self.config = None
        self.grid = None
        self.params = None
        self.model = None
        self.dem = None
        self.cell_size = None

    # ------------------------------------------------------------------
    def execute(self, line: str) -> bool:
        """Run one command line; returns False to quit."""
        parts = shlex.split(line, comments=True)
        if not parts:
            return True
        cmd = parts[0].upper()
        args = parts[1:]
        try:
            if cmd in ("QUIT", "EXIT"):
                return False
            elif cmd == "VERSION":
                print(f"criteria3d_tpu {criteria3d_tpu.__version__}")
            elif cmd == "PROJ":
                self._cmd_proj(args)
            elif cmd == "DEM":
                self._cmd_dem(args)
            elif cmd in ("INITIALIZE", "INIT"):
                self._cmd_initialize()
            elif cmd == "RUN":
                self._cmd_run(args)
            elif cmd == "STATE":
                self._cmd_state(args)
            elif cmd == "INFO":
                self._cmd_info()
            else:
                print(f"Invalid command: {cmd}")
        except Exception as exc:  # shell robustness, like the reference's
            print(f"ERROR: {exc}")
        return True

    # ------------------------------------------------------------------
    def _cmd_proj(self, args):
        from criteria3d_tpu.io.config import load_project_ini
        if not args:
            print("Usage: PROJ <project.ini>")
            return
        self.config = load_project_ini(args[0])
        print(f"Project: {self.config.name}  lat={self.config.latitude}")
        if self.config.dem_path:
            self._cmd_dem([self.config.dem_path])

    def _cmd_dem(self, args):
        from criteria3d_tpu.io.esri import read_flt
        if not args:
            print("Usage: DEM <path.flt>")
            return
        self.dem, hdr = read_flt(args[0])
        self.cell_size = hdr.cellsize
        valid = (~np.isclose(self.dem, hdr.nodata)).sum()
        print(f"DEM: {self.dem.shape}, cell {hdr.cellsize} m, {valid} valid cells")

    def _cmd_initialize(self):
        from criteria3d_tpu import Grid, SoilFields, SolverParameters
        from criteria3d_tpu.model import Criteria3DModel, ModelConfig
        if self.dem is None:
            print("Load a DEM first (DEM or PROJ).")
            return
        cfg = self.config
        soil = SoilFields.uniform(self.dem.shape, vg_alpha=1.0, vg_n=1.4,
                                  vg_he=0.02, theta_s=0.43, theta_r=0.05,
                                  k_sat=1e-5)
        grid = Grid.build(self.dem, self.cell_size, soil,
                          total_depth=(cfg.imposed_computation_depth
                                       if cfg else 1.0))
        params = (cfg.solver_parameters(self.cell_size) if cfg
                  else SolverParameters())
        mconfig = ModelConfig(
            latitude=cfg.latitude if cfg else 44.5,
            longitude=cfg.longitude if cfg else 11.3)
        psi0 = cfg.initial_water_potential if cfg else -2.0
        self.model = Criteria3DModel.create(grid, params, mconfig,
                                            matric_potential=psi0)
        self.grid, self.params = grid, params
        print(f"3D model initialized: {grid.n_layers} layers, "
              f"{grid.n_nodes} nodes")

    def _cmd_run(self, args):
        import jax.numpy as jnp
        from criteria3d_tpu.model import HourlyForcing
        if self.model is None:
            print("INITIALIZE first.")
            return
        if not args:
            print("Usage: RUN <hours> [rain_mm_h]")
            return
        hours = int(args[0])
        rain = float(args[1]) if len(args) > 1 else 0.0
        shape = self.grid.shape[1:]
        f = lambda v: jnp.full(shape, v, jnp.float64)
        for h in range(hours):
            forcing = HourlyForcing(air_temperature=f(15.0),
                                    precipitation=f(rain),
                                    rel_humidity=f(70.0), wind_speed=f(2.0))
            out = self.model.run_hour(forcing, 2023, 6, 15, h % 24)
            print(f"hour {h}: MBR={out['mbr']:.2e} "
                  f"courant={out['courant']:.2f}")

    def _cmd_state(self, args):
        from criteria3d_tpu.io.state_io import load_state, save_state
        if len(args) < 2:
            print("Usage: STATE SAVE|LOAD <dir>")
            return
        op, path = args[0].upper(), args[1]
        if self.model is None:
            print("INITIALIZE first.")
            return
        if op == "SAVE":
            save_state(path, self.grid, self.model.water,
                       snow=self.model.snow, degree_days=self.model.degree_days,
                       lai=self.model.lai)
            print(f"State saved to {path}")
        elif op == "LOAD":
            water, snow, extras = load_state(path, self.grid, self.params)
            self.model.water = water
            if snow is not None:
                self.model.snow = snow
            if "degreeDays" in extras:
                self.model.degree_days = extras["degreeDays"]
            if "lai" in extras:
                self.model.lai = extras["lai"]
            print(f"State loaded from {path}")

    def _cmd_info(self):
        if self.grid is None:
            print("No model loaded.")
            return
        from criteria3d_tpu.solver import water as W
        g = self.grid
        print(f"grid: {g.shape} ({g.n_nodes} nodes, "
              f"{g.n_surface_nodes} surface)")
        if self.model is not None:
            twc = float(W.total_water_content(g, self.params,
                                              self.model.water.h,
                                              self.model.water.se))
            print(f"total water content: {twc:.2f} m3")
            print(f"dt_curr: {float(self.model.water.dt_curr):.0f} s")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    shell = Shell()
    if argv:
        # batch mode
        with open(argv[0]) as f:
            for line in f:
                print(PROMPT + line.rstrip())
                if not shell.execute(line):
                    break
    else:
        while True:
            try:
                line = input(PROMPT)
            except EOFError:
                break
            if not shell.execute(line):
                break
    return 0


if __name__ == "__main__":
    sys.exit(main())
