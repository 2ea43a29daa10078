"""Prognostic state, balance bookkeeping and solver parameters.

Mirrors the reference's waterData_t / balanceData_t / SolverParameters
(agrolib/soilFluxes3D/types.h:137-184, 291-315) as JAX pytrees so the whole
adaptive-timestep state machine can live inside ``lax.while_loop``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from criteria3d_tpu.core.grid import Grid
from criteria3d_tpu.core.soil import (WRCModel, MeanType, se_from_psi,
                                      psi_from_se, mualem_conductivity)

__all__ = ["SolverParameters", "BalanceData", "WaterState"]


@dataclasses.dataclass(frozen=True)
class SolverParameters:
    """Numerical parameters (reference types.h:291-315, project3D.cpp:619-652).

    This is a *static* (hashable) config: changing any field triggers a
    re-jit. The evolving time step ``dt_curr`` lives in WaterState instead.
    """

    mbr_threshold: float = 1e-3
    residual_tolerance: float = 1e-10
    delta_t_min: float = 1.0
    delta_t_max: float = 600.0
    max_approximations: int = 10
    max_iterations: int = 200
    wrc_model: WRCModel = WRCModel.MODIFIED_VAN_GENUCHTEN
    mean_type: MeanType = MeanType.LOGARITHMIC
    lateral_vertical_ratio: float = 4.0
    heat_weight_factor: float = 0.5
    # Heat process options (simulationFlags.computeHeatVapor /
    # computeHeatAdvection, types.h:199-201): vapor adds the latent terms to
    # conductivity/capacity and the atmospheric latent flux (including the
    # HeatSurface evaporative *water* flux, water.cpp:708-747); advection
    # adds rain/evaporation advected heat to the surface boundary.
    heat_vapor: bool = False
    heat_advection: bool = False
    # Coupled-driver fast path: evaluate the T-dependent soil thermal
    # properties (capacity, de Vries/Campbell conductivity, vapor
    # conductivities, the CN conduction coefficients and the isothermal
    # latent link fluxes) ONCE per boundary heat chunk at chunk-start
    # temperatures, instead of per sub-step as the reference's heatLoop
    # does (cpusolver.cpp:471-605). The lag is <= the chunk length
    # (the Courant-limited dtHeat, seconds) over which T moves by mK, so
    # the property error is ~1e-6 relative; the measured whole-hour
    # envelope vs the exact path is recorded in
    # tests/test_coupled.py::test_frozen_props_envelope. Requires the
    # f32 sweep fast path; a DOCUMENTED deviation in the spirit of
    # fast_f32 itself (DEVIATIONS #31).
    heat_frozen_props: bool = False
    courant_threshold: float = 0.5     # Δt growth gate
    instability_factor: float = 10.0
    # Reproduce the reference's integer-abs quirk in the surface-Courant
    # velocity: water.cpp:477 computes `dH = abs(Hi - Hj)` with C's int abs,
    # truncating sub-metre head differences to zero, so the reference's
    # surface Courant limiter almost never fires. True (default) matches the
    # reference's trajectories (required for field-level parity); False uses
    # the physically-intended fractional head difference.
    courant_reference_compat: bool = True
    # Accumulate per-link water flows [m3] (linkData waterFlowSum,
    # water.cpp:269-277) into WaterState.link_flow_sum; costs 10 extra
    # full-size arrays, so off by default. Unlike the reference — which
    # reads the matrix AFTER Jacobi preconditioning, scaling its sums by
    # 1/diag — we use the physical (un-preconditioned) conductances.
    track_link_flow: bool = False
    # Reproduce the reference's culvert water-level expression verbatim:
    # water.cpp:760 computes `0.5*(H - Hold) - z` (the *difference* of the
    # heads, not their Crank-Nicolson average, which is almost certainly the
    # intended `0.5*(H + Hold) - z`). True (default) matches the reference;
    # False uses the averaged level.
    culvert_reference_compat: bool = True
    dtype: type = jnp.float64
    # Inner solve precision. None = same as dtype. float32 runs the whole
    # Picard loop (assembly + sweeps + balance values) on the native TPU VPU
    # in signed-psi form (head offset from node elevation): links difference
    # psi plus a static per-link dz, so f32 never differences absolute heads;
    # the f64 total-head state is reconstructed once per accepted step.
    sweep_dtype: type | None = None
    # Run the f32 sweeps through the Pallas bundled kernel
    # (solver/pallas_jacobi.py): K sweeps per HBM pass with VMEM-resident
    # coefficients. Convergence is then checked every K sweeps instead of
    # every sweep (same fixed point; a converged system may run up to K-1
    # extra no-op sweeps). Requires sweep_dtype=float32 and a TPU backend.
    use_pallas: bool = False
    # Device mesh for the SHARDED Pallas fast path. When set (a ('row','col')
    # jax.sharding.Mesh — hashable, so still a valid static jit key) the
    # Pallas sweep loop runs under shard_map with K-cell halo exchange per
    # bundle and psum'd norms (solver/pallas_jacobi.py jacobi_solve_loop);
    # the rest of the solver partitions via GSPMD from the array shardings.
    # None (default) = single-device kernel. Shard grid/state with
    # parallel.sharding.shard_pytree over the same mesh.
    mesh: object = None
    # Inner linear solver: "jacobi" (reference CPUSolver/GPUSolver default,
    # cpusolver.cpp:672-703) or "cg" — Jacobi(diagonal)-preconditioned
    # conjugate gradient, the analogue of the reference's optional "lineal"
    # external-solver bridge (LinealiaLib CG/PCG, cpusolver.cpp:608-669,
    # lineal/linealiaLib.h:9-97). The assembled system is a symmetric
    # M-matrix, so CG applies; like the reference's lineal path it does NOT
    # apply the per-sweep surface clamp — the clamp runs once on the
    # converged solution. Typically converges in far fewer iterations than
    # Jacobi; uses the same psi-weighted residual norm and tolerance.
    inner_solver: str = "jacobi"
    # CG preconditioner. "diag" is plain Jacobi (diagonal)
    # preconditioning. "line" solves the vertical tridiagonal block of
    # every soil column exactly per iteration (unrolled batched Thomas
    # over the ~11-layer axis, water.tridiag_vertical_solve) — the classic
    # remedy for this grid's centimetre-vertical vs metre-lateral
    # anisotropy, which otherwise dominates the condition number.
    # ROUND-4 5-run medians on full-res Ravone: line wins BOTH regimes
    # (storm 1.114 s vs diag 1.257, 51 vs 57 accepted steps; drainage
    # hours 1.238/0.197 vs 1.794/0.312 s) — the round-3 adverse
    # step-count flip (76 vs 57) no longer reproduces, so line is the
    # fast_f32 production default (BASELINE.md ladder). "auto" resolves
    # per hour at the model layer from cheap regime signals
    # (Criteria3DModel._resolve_precond), retained as a regime-splitting
    # hook should a future trajectory favour diag again; solver-level
    # code never sees "auto".
    cg_precond: str = "diag"

    def max_iterations_for(self, approx: int | jax.Array):
        """(approx+1) * maxIter/maxApprox, min 25 (solver.h:55-59)."""
        per = jnp.float32(self.max_iterations) / jnp.float32(self.max_approximations)
        n = ((approx + 1) * per).astype(jnp.int32)
        return jnp.maximum(n, 25)

    @staticmethod
    def fast_f32(**overrides) -> "SolverParameters":
        """Mixed-precision preset: the f32 psi-carry production path.

        The reference is FP64 throughout (types_gpu.h:34). Here the whole
        Picard loop — assembly, sweeps, balance values — runs in float32
        SIGNED-PSI form on the native TPU VPU (head offsets from node
        elevation plus static per-link dz, so f32 never differences
        absolute heads); the f64 state is reconstructed once per accepted
        step and balance sums still ACCUMULATE in f64. float32 cannot
        reach the reference's 1e-10 residual so the inner tolerance is
        relaxed to 1e-7 (the 1e-3 MBR acceptance gate — the actual
        accuracy contract — is unchanged and evaluated in f64).
        Accuracy: heads match the f64 path to <1 mm on a locked time-step
        trajectory; free-running, adaptive-dt decisions may flip near
        thresholds, bounding agreement by the scheme's own inter-trajectory
        discretization spread instead (tests/test_fast_f32.py).

        The inner solver defaults to preconditioned CG (measured 8-9%
        faster end-to-end than Jacobi sweeps on the Ravone benchmark:
        tighter inner convergence lets the adaptive dt grow larger, 57 vs
        81 steps/sim-hour) unless the caller requests the Pallas bundled
        Jacobi kernel (``use_pallas=True``) or overrides ``inner_solver``.
        """
        import jax.numpy as jnp
        args = dict(sweep_dtype=jnp.float32, residual_tolerance=1e-7)
        if not overrides.get("use_pallas", False) \
                and "inner_solver" not in overrides:
            args["inner_solver"] = "cg"
            # vertical-line Thomas preconditioner: round-4 5-run medians
            # win BOTH the storm hour (1.114 vs 1.257 s) and the drainage
            # hours (see cg_precond docs / BASELINE.md)
            args.setdefault("cg_precond", "line")
        args.update(overrides)
        return SolverParameters(**args)

    @staticmethod
    def from_model_accuracy(accuracy: int, cell_size: float) -> "SolverParameters":
        """App-level accuracy 1-5 → numerical parameters.

        Reference: Project3D::setAccuracy (project3D.cpp:619-652).
        """
        v_max = 5.0 + 5.0 * accuracy
        return SolverParameters(
            delta_t_min=min(6.0, cell_size / v_max),
            delta_t_max=3600.0,
            max_iterations=150,
            max_approximations=10,
            residual_tolerance=10.0 ** -(7 + accuracy),
            mbr_threshold=10.0 ** -accuracy,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BalanceData:
    """Scalar mass-balance bookkeeping (balanceData_t, types.h:175-184)."""

    storage: jax.Array          # [m3]
    sink_source: jax.Array      # [m3]
    mbe: jax.Array              # [m3]
    mbr: jax.Array              # [-]

    @staticmethod
    def zero(dtype=jnp.float64) -> "BalanceData":
        z = jnp.zeros((), dtype)
        return BalanceData(z, z, z, z)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WaterState:
    """Evolving water state. All field arrays are (L, R, C).

    ``h`` is the TOTAL hydraulic potential [m] (the reference's
    ``pressureHead``): z + matric potential for soil nodes, z + water depth
    for surface nodes.
    """

    h: jax.Array                 # [m] total potential
    h_old: jax.Array             # [m] previous accepted step
    best_h: jax.Array            # [m] best Picard iterate of current step
    se: jax.Array                # [-] degree of saturation
    k: jax.Array                 # [m s-1] hydraulic conductivity
    sink_source: jax.Array       # [m3 s-1] user-set water sink/source
    pond: jax.Array              # (R,C) [m] surface pond storage height
    boundary_flow_sum: jax.Array  # (L,R,C) [m3] cumulated boundary flow
    # (10,L,R,C) [m3] cumulated per-link flows (up, down, 8 lateral), the
    # linkData[..].waterFlowSum analogue (water.cpp:269-277); shape (0,)
    # when SolverParameters.track_link_flow is off (no memory cost)
    link_flow_sum: jax.Array

    dt_curr: jax.Array           # [s] adaptive time step (persistent)
    courant: jax.Array           # [-] last surface Courant number

    balance_prev: BalanceData     # previous accepted step
    balance_current: BalanceData  # current step
    balance_period: BalanceData   # current period (hour)
    balance_whole: BalanceData    # whole simulation

    @staticmethod
    def initialize(grid: Grid, params: SolverParameters, *,
                   matric_potential: jax.Array | float | None = None,
                   degree_of_saturation: jax.Array | float | None = None,
                   surface_water: float = 0.0) -> "WaterState":
        """Initial state from matric potential [m] or saturation degree.

        Reference: setNodeMatricPotential / setNodeDegreeOfSaturation
        (soilFluxes3D.cpp:842-884) + initializeWaterContent
        (project3D.cpp:1104-1158).
        """
        dt = params.dtype
        L, R, C = grid.shape
        if matric_potential is not None:
            psi = jnp.broadcast_to(jnp.asarray(matric_potential, dt), (L, R, C))
            h = grid.z + psi
            # surface nodes: water depth must be >= 0
            h = h.at[0].set(grid.z[0] + jnp.maximum(psi[0], surface_water))
            psi_mag = jnp.abs(jnp.minimum(h - grid.z, 0.0))
            se = jnp.where(h >= grid.z, 1.0,
                           se_from_psi(grid.soil, psi_mag, params.wrc_model))
        elif degree_of_saturation is not None:
            se = jnp.broadcast_to(jnp.asarray(degree_of_saturation, dt), (L, R, C))
            psi = psi_from_se(grid.soil, jnp.clip(se, 1e-9, 1.0), params.wrc_model)
            h = grid.z - psi
            h = h.at[0].set(grid.z[0] + surface_water)
        else:
            raise ValueError("give matric_potential or degree_of_saturation")

        se = se.at[0].set(1.0)
        se = jnp.where(grid.mask, se, 0.0)
        h = jnp.where(grid.mask, h, 0.0)
        k = jnp.where(grid.mask, mualem_conductivity(grid.soil, se, params.wrc_model), 0.0)
        k = k.at[0].set(0.0)

        zeros = jnp.zeros((L, R, C), dt)
        link0 = (jnp.zeros((10, L, R, C), dt) if params.track_link_flow
                 else jnp.zeros((0,), dt))
        state = WaterState(
            h=h, h_old=h, best_h=h, se=se, k=k,
            sink_source=zeros,
            pond=jnp.asarray(grid.pond_max, dt),
            boundary_flow_sum=zeros,
            link_flow_sum=link0,
            dt_curr=jnp.asarray(params.delta_t_max, dt),
            courant=jnp.zeros((), dt),
            balance_prev=BalanceData.zero(dt),
            balance_current=BalanceData.zero(dt),
            balance_period=BalanceData.zero(dt),
            balance_whole=BalanceData.zero(dt),
        )
        return state

    # convenience diagnostics -------------------------------------------------
    def matric_potential(self, grid: Grid) -> jax.Array:
        return jnp.where(grid.mask, self.h - grid.z, 0.0)

    def surface_water_level(self, grid: Grid) -> jax.Array:
        return jnp.where(grid.mask[0], jnp.maximum(self.h[0] - grid.z[0], 0.0), 0.0)
