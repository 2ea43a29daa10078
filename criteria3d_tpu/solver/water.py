"""Water-process physics: conductances, boundary fluxes, capacity, balance.

TPU-native stencil re-expression of agrolib/soilFluxes3D/water.cpp. Each
function is pure and shape-static; the reference's per-node parallel-for
becomes one fused element-wise pass over dense (L, R, C) fields, and its
neighbour-pointer chasing becomes the 8+2 stencil shifts of
:mod:`criteria3d_tpu.solver.shifts`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from criteria3d_tpu.constants import (DBL_EPSILON, EPSILON_METER,
                                      EPSILON_RUNOFF, MIN_INFILTRATION_RATE)
from criteria3d_tpu.core.grid import BoundaryType, Grid
from criteria3d_tpu.core.soil import (compute_mean, dtheta_dh,
                                      mualem_conductivity, se_from_psi,
                                      theta_from_se)
from criteria3d_tpu.core.state import SolverParameters
from criteria3d_tpu.solver.shifts import LATERAL_OFFSETS, shift2d

__all__ = [
    "total_water_content", "update_boundary_water", "compute_capacity",
    "compute_se", "assemble_system", "assemble_fast",
    "current_mass_balance", "LinearSystem",
]


class LinearSystem(NamedTuple):
    """Jacobi-preconditioned linear system in stencil form.

    ``x_new = b + c_up * x(l-1) + c_down * x(l+1) + sum_k c_lat[k] * x(nbr_k)``
    (the preconditioned off-diagonals are stored with their Jacobi-iteration
    sign, i.e. +a_ij/diag_i; reference cpusolver.cpp:284-305, water.cpp:565-601).
    """

    b: jax.Array        # (L,R,C) preconditioned RHS
    c_up: jax.Array     # (L,R,C) coefficient towards layer above
    c_down: jax.Array   # (L,R,C) coefficient towards layer below
    c_lat: jax.Array    # (8,L,R,C) lateral coefficients
    diag: jax.Array     # (L,R,C) original diagonal (C/dt + sum a)
    courant: jax.Array  # scalar: max surface Courant number of this assembly


def _work_dtype(params: SolverParameters):
    """Dtype for the transcendental-heavy conductance math.

    When the f32 fast path is active (sweep_dtype set) the retention-curve /
    Mualem evaluations also run in f32: they are smooth functions of the
    matric potential (computed as an f64 difference first, so no precision is
    lost to the large elevation offsets), and f64 transcendentals are
    software-emulated on TPU. The parity (pure f64) path is untouched.
    """
    return params.sweep_dtype if params.sweep_dtype is not None else params.dtype


def _soil_wd(grid: Grid, wd):
    """Soil parameter fields in the working dtype (no-op on the f64 path)."""
    if grid.soil.vg_alpha.dtype == wd:
        return grid.soil
    return jax.tree.map(lambda a: a.astype(wd), grid.soil)


def compute_se(grid: Grid, params: SolverParameters, h: jax.Array) -> jax.Array:
    """Subsurface degree of saturation from total potential.

    Reference: computeNodeSe (soilPhysics.cpp:68-83): 1 when saturated
    (h >= z), else the retention curve at psi = |h - z|. Layer 0 (surface)
    keeps Se = 1.
    """
    wd = _work_dtype(params)
    psi = jnp.abs(h - grid.z).astype(wd)
    se = jnp.where(h >= grid.z, 1.0,
                   se_from_psi(_soil_wd(grid, wd), psi, params.wrc_model))
    se = se.at[0].set(1.0)
    return jnp.where(grid.mask, se, 0.0).astype(params.dtype)


def total_water_content(grid: Grid, params: SolverParameters,
                        h: jax.Array, se: jax.Array) -> jax.Array:
    """Total water volume [m3] (computeTotalWaterContent, water.cpp:71-90).

    Surface nodes contribute water depth × area; soil nodes theta × volume.
    """
    surf = jnp.maximum(h[0] - grid.z[0], 0.0) * grid.volume[0]
    surf = jnp.where(grid.mask[0], surf, 0.0)
    wd = _work_dtype(params)
    if wd != params.dtype:
        # fast path: theta values in f32 (retention params are smooth; the
        # per-cell rounding is ~6e-8 relative), accumulation stays f64
        theta = theta_from_se(_soil_wd(grid, wd), se.astype(wd))
        soil = jnp.where(grid.mask, theta * grid.volume.astype(wd), 0.0)
    else:
        theta = theta_from_se(grid.soil, se)
        soil = jnp.where(grid.mask, theta * grid.volume, 0.0)
    soil = soil.at[0].set(0.0)
    # balance sums always accumulate in f64 so the MBR acceptance gate keeps
    # its meaning in float32 compute mode (mass closure is the acceptance
    # criterion, types.h:293)
    return (jnp.sum(surf, dtype=jnp.float64)
            + jnp.sum(soil, dtype=jnp.float64)).astype(h.dtype)


def update_boundary_water(grid: Grid, params: SolverParameters,
                          h: jax.Array, h_old: jax.Array, k: jax.Array,
                          sink_source: jax.Array, pond: jax.Array,
                          dt: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-node flow [m3 s-1] = sink/source + boundary flux.

    Reference: updateBoundaryWaterData (water.cpp:632-807). Returns
    ``(water_flow, boundary_rate)``.
    """
    avg_h = 0.5 * (h + h_old)
    flow = jnp.where(grid.mask, sink_source, 0.0)

    # surface negative flux (evaporation) limited by available water
    h_s0 = jnp.maximum(0.0, avg_h[0] - grid.z[0])
    max_surf_flux = -h_s0 * grid.volume[0] / dt
    flow0 = jnp.where(flow[0] < 0, jnp.maximum(flow[0], max_surf_flux), flow[0])
    flow = flow.at[0].set(jnp.where(grid.mask[0], flow0, 0.0))

    bt = grid.btype

    # --- Runoff (surface rim): Manning outflow ---
    hs = jnp.maximum(0.0, avg_h[0] - (grid.z[0] + pond))
    rough = jnp.maximum(grid.roughness, 1e-12)
    v = hs ** (2.0 / 3.0) * jnp.sqrt(jnp.maximum(grid.bslope[0], 0.0)) / rough
    max_flow = hs * grid.volume[0] / dt
    val_flow = hs * v * grid.bsize[0]
    runoff_rate0 = jnp.where(hs < EPSILON_RUNOFF, 0.0,
                             -jnp.minimum(val_flow, max_flow))
    runoff_rate = jnp.zeros_like(h).at[0].set(runoff_rate0)

    # --- FreeDrainage (bottom): Darcy unit gradient through the up interface ---
    fd_rate = -k * grid.area

    # --- FreeLateralDrainage (rim soil): Darcy gradient = slope ---
    fld_rate = -k * grid.bsize * grid.bslope * params.lateral_vertical_ratio

    # --- PrescribedTotalWaterPotential: fixed head 1 m below ---
    # (full-field retention/Mualem evaluation — skipped entirely on grids
    # without a prescribed boundary, grid.has_prescribed)
    if grid.has_prescribed:
        wd = _work_dtype(params)
        soil_w = _soil_wd(grid, wd)
        Lb = 1.0
        boundary_z = grid.z - Lb
        boundary_psi = (grid.prescribed_h - boundary_z).astype(wd)
        k_bound = jnp.where(
            boundary_psi >= 0, soil_w.k_sat,
            mualem_conductivity(
                soil_w,
                se_from_psi(soil_w, jnp.abs(boundary_psi), params.wrc_model),
                params.wrc_model))
        mean_k = compute_mean(k_bound, jnp.maximum(k.astype(wd), 1e-30),
                              params.mean_type)
        dh = grid.prescribed_h - h
        presc_rate = mean_k.astype(params.dtype) * grid.bsize * dh / Lb
    else:
        presc_rate = jnp.zeros_like(h)

    # --- Culvert (surface outlet): open-channel / mixed / pressure rating ---
    # Reference: water.cpp:749-795. Water level above the culvert invert;
    # the reference computes it as 0.5*(H - Hold) - z (gated quirk, see
    # SolverParameters.culvert_reference_compat). Skipped entirely on
    # grids without a culvert (grid.has_culvert).
    if grid.has_culvert:
        cw = grid.culvert_w
        ch = jnp.maximum(grid.culvert_h, 1e-12)
        crough = jnp.maximum(grid.culvert_rough, 1e-12)
        cslope = jnp.maximum(grid.bslope[0], 0.0)
        if params.culvert_reference_compat:
            wl = 0.5 * (h[0] - h_old[0]) - grid.z[0]
        else:
            wl = 0.5 * (h[0] + h_old[0]) - grid.z[0]
        # pressure flow, Hazen-Williams with C=70 (rough concrete)
        eq_diam = jnp.sqrt(4.0 * cw * ch / jnp.pi)
        pressure_flow = 70.0 * cslope ** 0.54 * eq_diam ** 2.63 / 3.591
        # full-section Manning flow (bsize = width*height)
        hr_full = grid.bsize[0] / jnp.maximum(cw + 2.0 * ch, 1e-12)
        manning_full = (grid.bsize[0] / crough) * jnp.sqrt(cslope) \
            * hr_full ** (2.0 / 3.0)
        mix_w = jnp.clip((wl - ch) / (0.5 * ch), 0.0, 1.0)
        mixed_flow = mix_w * pressure_flow + (1.0 - mix_w) * manning_full
        # open-channel Manning at the current water level
        oc_area = cw * jnp.maximum(wl, 0.0)
        hr_open = oc_area / jnp.maximum(cw + 2.0 * jnp.maximum(wl, 0.0),
                                        1e-12)
        open_flow = (oc_area / crough) * jnp.sqrt(cslope) \
            * hr_open ** (2.0 / 3.0)
        culvert_flow = jnp.where(
            wl >= 1.5 * ch, pressure_flow,
            jnp.where(wl >= ch, mixed_flow,
                      jnp.where(wl > pond, open_flow, 0.0)))
        culvert_rate = jnp.zeros_like(h).at[0].set(-culvert_flow)
    else:
        culvert_rate = jnp.zeros_like(h)

    rate = jnp.zeros_like(h)
    rate = jnp.where(bt == BoundaryType.RUNOFF, runoff_rate, rate)
    rate = jnp.where(bt == BoundaryType.FREE_DRAINAGE, fd_rate, rate)
    rate = jnp.where(bt == BoundaryType.FREE_LATERAL_DRAINAGE, fld_rate, rate)
    rate = jnp.where(bt == BoundaryType.PRESCRIBED_TOTAL_POTENTIAL, presc_rate, rate)
    rate = jnp.where(bt == BoundaryType.CULVERT, culvert_rate, rate)
    # Urban / Road boundary nodes carry no boundary flow (they only modulate
    # infiltration, water.cpp:503-513); reference default branch leaves rate 0.

    rate = jnp.where(jnp.abs(rate) < DBL_EPSILON, 0.0, rate)
    rate = jnp.where(grid.mask, rate, 0.0)
    return flow + rate, rate


def compute_capacity(grid: Grid, params: SolverParameters,
                     h: jax.Array, h_old: jax.Array, se: jax.Array
                     ) -> tuple[jax.Array, jax.Array]:
    """Capacity vector C [m2] and refreshed conductivity K [m s-1].

    Surface capacity = cell area (free-surface storage, cpusolver.cpp:151);
    soil capacity = volume × dTheta/dH (water.cpp:279-297).
    """
    wd = _work_dtype(params)
    k = mualem_conductivity(_soil_wd(grid, wd), se.astype(wd), params.wrc_model)
    k = jnp.where(grid.mask, k, 0.0).at[0].set(0.0).astype(params.dtype)

    if wd == params.dtype:
        dtdh = dtheta_dh(grid.soil, h, h_old, grid.z, params.wrc_model)
    else:
        # fast path: psi and its difference in f64 (the reference's 1e-12
        # secant threshold is below f32 resolution), VG evaluations in f32
        # with the secant applied only when the chord is f32-resolvable
        psi_c64 = jnp.minimum(0.0, h - grid.z)
        psi_p64 = jnp.minimum(0.0, h_old - grid.z)
        soil_w = _soil_wd(grid, wd)
        psi_c = jnp.abs(psi_c64).astype(wd)
        psi_p = jnp.abs(psi_p64).astype(wd)
        if params.wrc_model.name == "VAN_GENUCHTEN":
            saturated = (psi_c == 0.0) & (psi_p == 0.0)
        else:
            saturated = (psi_c <= soil_w.vg_he) & (psi_p <= soil_w.vg_he)
        n = soil_w.vg_n
        x = soil_w.vg_alpha * jnp.maximum(psi_c, 1e-20)
        term = (1.0 + x ** n) ** (-(soil_w.vg_m + 1.0)) * x ** (n - 1.0)
        dse_a = soil_w.vg_alpha * n * soil_w.vg_m * term / soil_w.vg_sc
        se_c = se_from_psi(soil_w, psi_c, params.wrc_model)
        se_p = se_from_psi(soil_w, psi_p, params.wrc_model)
        dh_64 = (h - h_old).astype(wd)
        dse_s = jnp.abs((se_c - se_p) / jnp.where(dh_64 != 0, dh_64, 1.0))
        resolvable = jnp.abs(psi_c - psi_p) > 1e-4
        dse = jnp.where(resolvable, dse_s, dse_a)
        dse = jnp.where(saturated, 0.0, dse)
        dtdh = (dse * (soil_w.theta_s - soil_w.theta_r)).astype(params.dtype)
    cap = grid.volume * dtdh
    cap = cap.at[0].set(grid.volume[0])
    cap = jnp.where(grid.mask, cap, 1.0)
    return cap, k


def _vertical_conductance(grid: Grid, params: SolverParameters,
                          h: jax.Array, h_old: jax.Array, k: jax.Array,
                          water_flow: jax.Array, dt: jax.Array) -> jax.Array:
    """a_up[l]: conductance of the link (l, l-1). a_up[0] = 0.

    l >= 2: vertical redistribution (water.cpp:542-562);
    l == 1: surface-soil infiltration (water.cpp:490-539).
    """
    L = grid.n_layers
    wd = _work_dtype(params)
    avg_h = 0.5 * (h + h_old)
    k = k.astype(wd)

    # redistribution: logarithmic-mean K × area / dz (in the working dtype:
    # the log-mean is the transcendental hot spot of assembly)
    k_above = jnp.roll(k, 1, axis=0)  # k[l-1]; wrapped l=0 row is masked out
    mean_k = compute_mean(jnp.maximum(k, 1e-30), jnp.maximum(k_above, 1e-30),
                          params.mean_type)
    dist = jnp.where(grid.vert_dist > 0, grid.vert_dist, 1.0).astype(wd)
    a_redist = mean_k * jnp.asarray(grid.area, wd) / dist

    # infiltration (link 0-1)
    dist01 = grid.vert_dist[1, 0, 0]
    bt1 = grid.btype[1]
    bf = jnp.where(bt1 == BoundaryType.URBAN, 0.33,
                   jnp.where(bt1 == BoundaryType.ROAD, 0.0, 1.0))
    ksat1 = grid.soil.k_sat[1]
    sat_val = ksat1 * bf * grid.area / dist01

    surf_h = avg_h[0]
    soil_h = avg_h[1]
    surface_water = jnp.maximum(surf_h - grid.z[0], 0.0)
    sbf = water_flow[0]
    surface_water = jnp.where(
        sbf < 0, jnp.maximum(0.0, surface_water + sbf * dt / grid.volume[0]),
        surface_water)
    max_inf_rate = surface_water / dt
    dh = jnp.maximum(surf_h - soil_h, 1e-12)
    max_k = max_inf_rate * dist01 / dh
    mean_k01 = compute_mean(ksat1, jnp.maximum(k[1], 1e-30), params.mean_type)
    unsat_val = jnp.where(max_inf_rate < MIN_INFILTRATION_RATE, 0.0,
                          jnp.minimum(bf * mean_k01, max_k) * grid.area / dist01)
    infil = jnp.where(h[1] > grid.z[0], sat_val, unsat_val)

    layer_idx = jnp.arange(L).reshape(L, 1, 1)
    a_up = jnp.where(layer_idx >= 2, a_redist, 0.0)
    if L > 1:
        a_up = a_up.at[1].set(infil.astype(wd))

    link_ok = grid.mask & jnp.roll(grid.mask, 1, axis=0)
    link_ok = link_ok.at[0].set(False)
    return jnp.where(link_ok, a_up, 0.0)


def _lateral_conductances(grid: Grid, params: SolverParameters,
                          h: jax.Array, h_old: jax.Array, k: jax.Array,
                          water_flow: jax.Array, pond: jax.Array,
                          approx_is_first: jax.Array, dt: jax.Array
                          ) -> tuple[jax.Array, jax.Array]:
    """(a_lat[8], courant_max): lateral link conductances.

    Layer 0: Manning diffusive-wave runoff conductance with Courant tracking
    (runoffConductance, water.cpp:413-487); layers >= 1: anisotropic lateral
    redistribution (water.cpp:542-562, lateral K × lateralVerticalRatio,
    3-D node distance).
    """
    lvr = params.lateral_vertical_ratio
    wd = _work_dtype(params)
    avg_h = 0.5 * (h + h_old)

    # surface quantities with the approx-0 rainfall predictor (water.cpp:423-431)
    h_surf = avg_h[0] + jnp.where(
        approx_is_first & (water_flow[0] > 0),
        0.5 * water_flow[0] * dt / grid.volume[0], 0.0)
    z_pond = grid.z[0] + pond
    rough = grid.roughness

    k_soil = jnp.maximum(k.astype(wd) * jnp.asarray(lvr, wd), 1e-30)
    lat_area_w = grid.lat_area.astype(wd)

    a_list = []
    courant = jnp.zeros((), h.dtype)
    for idx, (di, dj) in enumerate(LATERAL_OFFSETS):
        nbr_ok = shift2d(grid.mask, di, dj, fill=False)

        # --- soil lateral redistribution (working dtype: log-mean hot spot) ---
        k_nbr = jnp.maximum(shift2d(k_soil, di, dj), 1e-30)
        mean_k = compute_mean(k_soil, k_nbr, params.mean_type)
        dist3d = grid.lat_dist3d[idx].astype(wd)   # (R,C), layer independent
        a_soil = mean_k * lat_area_w / dist3d

        # --- surface runoff conductance ---
        hi = h_surf
        hj = shift2d(h_surf, di, dj)
        zi = z_pond
        zj = shift2d(z_pond, di, dj)
        hs = jnp.maximum(hi, hj) - jnp.maximum(zi, zj)
        dxy = grid.lat_dist2d[idx, 0, 0]
        rough_ij = 0.5 * (rough + shift2d(rough, di, dj))
        hs23 = jnp.maximum(hs, 0.0) ** (2.0 / 3.0)
        a_surface = (grid.lat_area[0, 0, 0] * hs) * hs23 / (rough_ij * dxy)
        invalid = (hs <= EPSILON_METER) | (rough_ij <= 0.0)
        a_surface = jnp.where(invalid, 0.0, a_surface)

        # Courant: Manning velocity × dt / dx.
        # The reference computes dH with C's integer abs (water.cpp:477),
        # truncating |dH| < 1 m to zero — reproduced when
        # courant_reference_compat is set (see SolverParameters).
        dh_ij = jnp.abs(hi - hj)
        if params.courant_reference_compat:
            dh_ij = jnp.trunc(dh_ij)
        slope = jnp.where(dh_ij > EPSILON_METER, dh_ij / dxy, 0.0)
        v = hs23 * jnp.sqrt(slope) / rough_ij
        cour = jnp.where(invalid | ~nbr_ok[0] | ~grid.mask[0], 0.0, v * dt / dxy)
        courant = jnp.maximum(courant, jnp.max(cour))

        a = a_soil.at[0].set(a_surface.astype(wd))
        a = jnp.where(grid.mask & nbr_ok, a, 0.0)
        a_list.append(a)

    return jnp.stack(a_list), courant


def assemble_system(grid: Grid, params: SolverParameters,
                    h: jax.Array, h_old: jax.Array, k: jax.Array,
                    water_flow: jax.Array, capacity: jax.Array,
                    pond: jax.Array, approx: jax.Array, dt: jax.Array
                    ) -> LinearSystem:
    """Build the Jacobi-preconditioned linear system for one Picard iteration.

    (C/dt + sum_j a_ij) H_i - sum_j a_ij H_j = C/dt H_i^0 + Q_i
    Reference: computeLinearSystemElement + computeDiagonalElement +
    preconditioningMatrix (cpusolver.cpp:335-389, 284-305).
    """
    a_up = _vertical_conductance(grid, params, h, h_old, k, water_flow, dt)
    a_lat, courant = _lateral_conductances(
        grid, params, h, h_old, k, water_flow, pond, approx == 0, dt)

    # a_down[l] = a_up[l+1] (same link seen from above)
    a_down = jnp.roll(a_up, -1, axis=0).at[-1].set(0.0)

    sum_a = a_up + a_down + jnp.sum(a_lat, axis=0)
    diag = capacity / dt + sum_a
    diag = jnp.where(grid.mask, diag, 1.0)

    b = (capacity / dt) * h_old + water_flow
    b = jnp.where(grid.mask, b, 0.0)

    inv_diag = 1.0 / diag
    return LinearSystem(
        b=b * inv_diag,
        c_up=a_up * inv_diag,
        c_down=a_down * inv_diag,
        c_lat=a_lat * inv_diag[None],
        diag=diag,
        courant=courant,
    )


# ----------------------------------------------------------------------
# float32 psi-form fast assembly (production TPU mode)
# ----------------------------------------------------------------------

def assemble_fast(grid: Grid, params: SolverParameters,
                  psi: jax.Array, psi_old: jax.Array,
                  se: jax.Array, sink_source: jax.Array, pond: jax.Array,
                  approx: jax.Array, dt: jax.Array, extra_flux_fn=None,
                  boundary_flux_fn=None):
    """Capacity + boundary flows + stencil assembly in ONE float32 pass,
    with the RHS directly in psi-form.

    Numerically equivalent to compute_capacity + update_boundary_water +
    assemble_system followed by the elevation fold of
    :func:`criteria3d_tpu.solver.step._jacobi_solve` — but formulated
    entirely in OFFSET space (psi = h - z per node, static per-link dz for
    neighbour differences), so no f32 operation ever sees an absolute head:
    head differences keep micrometre precision over hundreds of metres of
    relief, and the TPU never runs emulated-f64 element-wise chains. The
    psi-form RHS identity (derivation in the r3 design notes):

        b'_i = (C_i/dt) psi_old_i + Q_i + sum_j a_ij (z_j - z_i)

    with z_j - z_i = +vert_dist[l] (up), -vert_dist[l+1] (down) and
    grid.dz_lat[k] (lateral, layer-independent).

    PSI-NATIVE since the psi-carry refactor: ``psi``/``psi_old``/``se``
    are float32 signed-psi / saturation fields (the Picard loop carries
    them directly, reconstructing f64 total heads only on step
    acceptance); all outputs ``(system, water_flow, boundary_rate, k)``
    stay in the sweep dtype. Callbacks receive SIGNED PSI:
    ``extra_flux_fn(psi, k)``, ``boundary_flux_fn(psi, dt)``. Only
    meaningful when ``params.sweep_dtype`` is set (the fast path).
    """
    sd = params.sweep_dtype
    mask = grid.mask
    soil32 = _soil_wd(grid, sd)
    dt32 = jnp.asarray(dt, sd)
    lvr = jnp.asarray(params.lateral_vertical_ratio, sd)

    avg_psi = 0.5 * (psi + psi_old)
    vol32 = grid.volume.astype(sd)
    area32 = jnp.asarray(grid.area, sd)

    # --- capacity + conductivity: ONE fused retention chain -------------
    # The VG power x^n and the retention base (1+x^n)^(-m) are shared by
    # the conductivity and the analytic capacity through exact algebraic
    # identities — Se^(1/m) = 1/(1+x^n) and (1+x^n)^(-m-1) = base/(1+x^n),
    # x^(n-1) = x^n/x — and the Mualem denominator is the precomputed
    # soil field, cutting the per-iteration transcendental count roughly
    # in half (the hot path is VPU-transcendental-bound, BASELINE.md).
    psi_c = jnp.abs(jnp.minimum(psi, 0.0))
    psi_p = jnp.abs(jnp.minimum(psi_old, 0.0))
    n = soil32.vg_n
    m = soil32.vg_m
    x = soil32.vg_alpha * jnp.maximum(psi_c, 1e-20)
    xn = x ** n
    one = 1.0 + xn
    base = one ** (-m)                      # unscaled retention (1+x^n)^-m

    se_c = jnp.clip(se, 1e-12, 1.0)
    frac = xn / one                          # = 1 - Se_unscaled^(1/m)
    num = 1.0 - frac ** m
    if params.wrc_model.name == "VAN_GENUCHTEN":
        saturated = (psi_c == 0.0) & (psi_p == 0.0)
        temp = num
    else:
        saturated = (psi_c <= soil32.vg_he) & (psi_p <= soil32.vg_he)
        temp = num / soil32.mualem_den
    k = soil32.k_sat * se_c ** soil32.mualem_l * temp * temp
    k = jnp.where(se >= 1.0, soil32.k_sat, k)
    k = jnp.where(mask, k, 0.0).at[0].set(0.0)

    term = (base / one) * (xn / x)           # (1+x^n)^-(m+1) * x^(n-1)
    dse_a = soil32.vg_alpha * n * m * term / soil32.vg_sc
    # se at the current iterate was already computed by compute_se from the
    # same h and retention model — reuse it instead of re-evaluating the
    # retention curve (one full-field VG pass per Picard iteration)
    se_c = se
    se_p = se_from_psi(soil32, psi_p, params.wrc_model)
    dh32 = psi - psi_old
    dse_s = jnp.abs((se_c - se_p) / jnp.where(dh32 != 0, dh32, 1.0))
    resolvable = jnp.abs(psi_c - psi_p) > 1e-4
    dse = jnp.where(resolvable, dse_s, dse_a)
    dse = jnp.where(saturated, 0.0, dse)
    capacity = vol32 * dse * (soil32.theta_s - soil32.theta_r)
    capacity = capacity.at[0].set(vol32[0])
    capacity = jnp.where(mask, capacity, 1.0)

    # --- boundary flows (update_boundary_water in offset space) ---------
    flow = jnp.where(mask, sink_source.astype(sd), 0.0)
    h_s0 = jnp.maximum(0.0, avg_psi[0])
    max_surf_flux = -h_s0 * vol32[0] / dt32
    flow0 = jnp.where(flow[0] < 0, jnp.maximum(flow[0], max_surf_flux), flow[0])
    flow = flow.at[0].set(jnp.where(mask[0], flow0, 0.0))

    bt = grid.btype
    pond32 = pond.astype(sd)
    bslope32 = grid.bslope.astype(sd)
    bsize32 = grid.bsize.astype(sd)
    rough32 = grid.roughness.astype(sd)

    # Runoff (surface rim): Manning outflow
    hs0 = jnp.maximum(0.0, avg_psi[0] - pond32)
    rough_s = jnp.maximum(rough32, 1e-12)
    v = hs0 ** (2.0 / 3.0) * jnp.sqrt(jnp.maximum(bslope32[0], 0.0)) / rough_s
    max_flow = hs0 * vol32[0] / dt32
    val_flow = hs0 * v * bsize32[0]
    runoff_rate0 = jnp.where(hs0 < EPSILON_RUNOFF, 0.0,
                             -jnp.minimum(val_flow, max_flow))
    runoff_rate = jnp.zeros_like(psi).at[0].set(runoff_rate0)

    # FreeDrainage (bottom): Darcy unit gradient
    fd_rate = -k * area32

    # FreeLateralDrainage (rim soil)
    fld_rate = -k * bsize32 * bslope32 * lvr

    rate = jnp.zeros_like(psi)
    rate = jnp.where(bt == BoundaryType.RUNOFF, runoff_rate, rate)
    rate = jnp.where(bt == BoundaryType.FREE_DRAINAGE, fd_rate, rate)
    rate = jnp.where(bt == BoundaryType.FREE_LATERAL_DRAINAGE, fld_rate, rate)

    if grid.has_prescribed:
        # PrescribedTotalWaterPotential: fixed head 1 m below (full-field
        # retention/Mualem math — static-gated on grid.has_prescribed)
        Lb = 1.0
        prescribed_psi = (grid.prescribed_h - grid.z).astype(sd)
        boundary_psi = prescribed_psi + Lb
        k_bound = jnp.where(
            boundary_psi >= 0, soil32.k_sat,
            mualem_conductivity(
                soil32,
                se_from_psi(soil32, jnp.abs(boundary_psi), params.wrc_model),
                params.wrc_model))
        mean_kb = compute_mean(k_bound, jnp.maximum(k, 1e-30),
                               params.mean_type)
        presc_rate = mean_kb * bsize32 * (prescribed_psi - psi) / Lb
        rate = jnp.where(bt == BoundaryType.PRESCRIBED_TOTAL_POTENTIAL,
                         presc_rate, rate)

    if grid.has_culvert:
        # Culvert (surface outlet) — static-gated on grid.has_culvert
        cw = grid.culvert_w.astype(sd)
        ch = jnp.maximum(grid.culvert_h.astype(sd), 1e-12)
        crough = jnp.maximum(grid.culvert_rough.astype(sd), 1e-12)
        cslope = jnp.maximum(bslope32[0], 0.0)
        if params.culvert_reference_compat:
            # the reference's verbatim 0.5*(H - Hold) - z needs the absolute
            # surface elevation (f32 of ~100 m is exact to micrometres, fine
            # for a comparison against metre-scale culvert heights)
            wl = 0.5 * (psi[0] - psi_old[0]) - grid.z[0].astype(sd)
        else:
            wl = avg_psi[0]
        eq_diam = jnp.sqrt(4.0 * cw * ch / jnp.pi)
        pressure_flow = 70.0 * cslope ** 0.54 * eq_diam ** 2.63 / 3.591
        hr_full = bsize32[0] / jnp.maximum(cw + 2.0 * ch, 1e-12)
        manning_full = (bsize32[0] / crough) * jnp.sqrt(cslope) * hr_full ** (2.0 / 3.0)
        mix_w = jnp.clip((wl - ch) / (0.5 * ch), 0.0, 1.0)
        mixed_flow = mix_w * pressure_flow + (1.0 - mix_w) * manning_full
        oc_area = cw * jnp.maximum(wl, 0.0)
        hr_open = oc_area / jnp.maximum(cw + 2.0 * jnp.maximum(wl, 0.0), 1e-12)
        open_flow = (oc_area / crough) * jnp.sqrt(cslope) * hr_open ** (2.0 / 3.0)
        culvert_flow = jnp.where(
            wl >= 1.5 * ch, pressure_flow,
            jnp.where(wl >= ch, mixed_flow,
                      jnp.where(wl > pond32, open_flow, 0.0)))
        culvert_rate = jnp.zeros_like(psi).at[0].set(-culvert_flow)
        rate = jnp.where(bt == BoundaryType.CULVERT, culvert_rate, rate)
    rate = jnp.where(jnp.abs(rate) < DBL_EPSILON, 0.0, rate)
    rate = jnp.where(mask, rate, 0.0)
    if boundary_flux_fn is not None:
        # per-iteration boundary flow (HeatSurface evaporative water sink,
        # water.cpp:708-747): enters RHS and balance like any boundary rate
        br = boundary_flux_fn(psi, dt).astype(sd)
        rate = rate + br
    water_flow = flow + rate

    # --- vertical conductances (offset-space infiltration) --------------
    L = grid.n_layers
    vd32 = jnp.where(grid.vert_dist > 0, grid.vert_dist, 1.0).astype(sd)
    k_above = jnp.roll(k, 1, axis=0)
    mean_k = compute_mean(jnp.maximum(k, 1e-30), jnp.maximum(k_above, 1e-30),
                          params.mean_type)
    a_redist = mean_k * area32 / vd32

    dist01 = grid.vert_dist[1, 0, 0].astype(sd)
    bt1 = bt[1]
    bf = jnp.where(bt1 == BoundaryType.URBAN, 0.33,
                   jnp.where(bt1 == BoundaryType.ROAD, 0.0, 1.0))
    ksat1 = soil32.k_sat[1]
    sat_val = ksat1 * bf * area32 / dist01

    surface_water = jnp.maximum(avg_psi[0], 0.0)
    sbf = water_flow[0]
    surface_water = jnp.where(
        sbf < 0, jnp.maximum(0.0, surface_water + sbf * dt32 / vol32[0]),
        surface_water)
    max_inf_rate = surface_water / dt32
    # surf_h - soil_h = avg_psi0 - avg_psi1 + (z0 - z1)
    dh01 = jnp.maximum(avg_psi[0] - avg_psi[1] + dist01, 1e-12)
    max_k = max_inf_rate * dist01 / dh01
    mean_k01 = compute_mean(ksat1, jnp.maximum(k[1], 1e-30), params.mean_type)
    unsat_val = jnp.where(max_inf_rate < MIN_INFILTRATION_RATE, 0.0,
                          jnp.minimum(bf * mean_k01, max_k) * area32 / dist01)
    # h[1] > z[0]  <=>  psi[1] > z[0] - z[1]
    infil = jnp.where(psi[1] > dist01, sat_val, unsat_val)

    layer_idx = jnp.arange(L).reshape(L, 1, 1)
    a_up = jnp.where(layer_idx >= 2, a_redist, 0.0)
    if L > 1:
        a_up = a_up.at[1].set(infil)
    link_ok = mask & jnp.roll(mask, 1, axis=0)
    link_ok = link_ok.at[0].set(False)
    a_up = jnp.where(link_ok, a_up, 0.0)

    # --- lateral conductances + Courant (offset space) ------------------
    hi = avg_psi[0] + jnp.where(
        (approx == 0) & (water_flow[0] > 0),
        0.5 * water_flow[0] * dt32 / vol32[0], 0.0)
    k_soil = jnp.maximum(k * lvr, 1e-30)
    lat_area32 = grid.lat_area.astype(sd)
    dz_lat32 = grid.dz_lat.astype(sd)

    a_lat_list = []
    courant = jnp.zeros((), sd)
    for idx, (di, dj) in enumerate(LATERAL_OFFSETS):
        nbr_ok = shift2d(mask, di, dj, fill=False)
        dz = dz_lat32[idx]                        # (R,C): z(nbr) - z

        k_nbr = jnp.maximum(shift2d(k_soil, di, dj), 1e-30)
        mean_kl = compute_mean(k_soil, k_nbr, params.mean_type)
        a_soil = mean_kl * lat_area32 / grid.lat_dist3d[idx].astype(sd)

        hj = shift2d(hi, di, dj)
        pond_j = shift2d(pond32, di, dj)
        # max(Hi, Hj) - max(Zi+pond_i, Zj+pond_j), base z_i
        hs = (jnp.maximum(hi, hj + dz)
              - jnp.maximum(pond32, pond_j + dz))
        dxy = grid.lat_dist2d[idx, 0, 0].astype(sd)
        rough_ij = 0.5 * (rough32 + shift2d(rough32, di, dj))
        hs23 = jnp.maximum(hs, 0.0) ** (2.0 / 3.0)
        a_surface = (lat_area32[0, 0, 0] * hs) * hs23 / (rough_ij * dxy)
        invalid = (hs <= EPSILON_METER) | (rough_ij <= 0.0)
        a_surface = jnp.where(invalid, 0.0, a_surface)

        dh_ij = jnp.abs(hi - hj - dz)
        if params.courant_reference_compat:
            dh_ij = jnp.trunc(dh_ij)
        slope = jnp.where(dh_ij > EPSILON_METER, dh_ij / dxy, 0.0)
        vv = hs23 * jnp.sqrt(slope) / rough_ij
        cour = jnp.where(invalid | ~nbr_ok[0] | ~mask[0], 0.0, vv * dt32 / dxy)
        courant = jnp.maximum(courant, jnp.max(cour))

        a = a_soil.at[0].set(a_surface)
        a_lat_list.append(jnp.where(mask & nbr_ok, a, 0.0))
    a_lat = jnp.stack(a_lat_list)

    # --- psi-form system + Jacobi preconditioning -----------------------
    a_down = jnp.roll(a_up, -1, axis=0).at[-1].set(0.0)
    sum_a = a_up + a_down + jnp.sum(a_lat, axis=0)
    diag = capacity / dt32 + sum_a
    diag = jnp.where(mask, diag, 1.0)

    # RHS-only extra flux (the invariantFluxes mechanism,
    # cpusolver.cpp:388): thermal heat-coupling water flows enter b but
    # NOT the balance sums (computeWaterSinkSourceFlowsSum reads waterFlow
    # only, water.cpp:130-141)
    rhs_flow = water_flow
    if extra_flux_fn is not None:
        rhs_flow = water_flow + extra_flux_fn(psi, k).astype(sd)

    vd_down = jnp.roll(vd32, -1, axis=0)
    b = (capacity / dt32) * psi_old + rhs_flow
    b = b + a_up * vd32 - a_down * vd_down
    for idx in range(8):
        b = b + a_lat[idx] * dz_lat32[idx]
    b = jnp.where(mask, b, 0.0)

    inv_diag = 1.0 / diag
    system = LinearSystem(
        b=b * inv_diag,
        c_up=a_up * inv_diag,
        c_down=a_down * inv_diag,
        c_lat=a_lat * inv_diag[None],
        diag=diag,
        courant=courant.astype(params.dtype),
    )
    return system, water_flow, rate, k


def compute_se_psi(grid: Grid, params: SolverParameters,
                   psi: jax.Array) -> jax.Array:
    """Degree of saturation from SIGNED PSI in the sweep dtype (the
    psi-carry form of :func:`compute_se`; computeNodeSe,
    soilPhysics.cpp:68-83)."""
    sd = psi.dtype
    soil32 = _soil_wd(grid, sd)
    se = jnp.where(psi >= 0, 1.0,
                   se_from_psi(soil32, jnp.abs(psi), params.wrc_model))
    se = se.at[0].set(1.0)
    return jnp.where(grid.mask, se, 0.0)


def current_mass_balance_psi(grid: Grid, params: SolverParameters,
                             psi: jax.Array, se: jax.Array,
                             water_flow: jax.Array,
                             prev_storage: jax.Array, dt: jax.Array):
    """(storage, sink, MBE, MBR) from the f32 psi-carry state.

    Same f64 accumulation discipline as :func:`current_mass_balance` —
    the values are f32-quantised exactly as they were when the f64 head
    was reconstructed from f32 psi, so the acceptance gate's meaning is
    unchanged (computeCurrentMassBalance, water.cpp:96-123)."""
    sd = psi.dtype
    vol32 = grid.volume.astype(sd)
    surf = jnp.where(grid.mask[0], jnp.maximum(psi[0], 0.0) * vol32[0], 0.0)
    theta = theta_from_se(_soil_wd(grid, sd), se)
    soil = jnp.where(grid.mask, theta * vol32, 0.0).at[0].set(0.0)
    storage = (jnp.sum(surf, dtype=jnp.float64)
               + jnp.sum(soil, dtype=jnp.float64)).astype(params.dtype)
    delta_storage = storage - prev_storage
    sink = (jnp.sum(jnp.where(grid.mask, water_flow, 0.0),
                    dtype=jnp.float64) * dt).astype(params.dtype)
    mbe = delta_storage - sink

    time_pct = 0.001 * jnp.maximum(dt, 30.0) / 3600.0
    min_ref = jnp.maximum(storage * time_pct, 0.001)
    ref_water = jnp.maximum(jnp.abs(sink), min_ref)
    mbr = mbe / ref_water
    return storage, sink, mbe, mbr


def jacobi_sweep(system: LinearSystem, x: jax.Array, grid: Grid,
                 n_nodes: int) -> tuple[jax.Array, jax.Array]:
    """One Jacobi iteration; returns (x_new, psi-weighted mean |dx| norm).

    Reference: JacobiWaterCPU (water.cpp:565-601) — including the surface
    clamp x >= z and the 1/psi norm weighting for |psi| > 1.
    """
    acc = system.b
    acc = acc + system.c_up * jnp.roll(x, 1, axis=0)
    acc = acc + system.c_down * jnp.roll(x, -1, axis=0)
    for idx, (di, dj) in enumerate(LATERAL_OFFSETS):
        acc = acc + system.c_lat[idx] * shift2d(x, di, dj)

    x_new = acc.at[0].set(jnp.maximum(acc[0], grid.z[0]))
    x_new = jnp.where(grid.mask, x_new, 0.0)

    dx = jnp.abs(x_new - x)
    psi = jnp.abs(x_new - grid.z)
    weight = jnp.where(psi > 1.0, 1.0 / psi, 1.0)
    norm = jnp.sum(jnp.where(grid.mask, dx * weight, 0.0)) / n_nodes
    return x_new, norm


def jacobi_sweep_psi(system: LinearSystem, psi: jax.Array, grid: Grid,
                     n_nodes: int) -> tuple[jax.Array, jax.Array]:
    """One Jacobi iteration in psi-form (x = z + psi), any dtype.

    Same fixed point and norm as :func:`jacobi_sweep` — the surface clamp
    x >= z becomes psi >= 0 and the 1/|psi| norm weight is direct. Used for
    the float32 fast sweep path (SolverParameters.sweep_dtype).
    """
    acc = system.b
    acc = acc + system.c_up * jnp.roll(psi, 1, axis=0)
    acc = acc + system.c_down * jnp.roll(psi, -1, axis=0)
    for idx, (di, dj) in enumerate(LATERAL_OFFSETS):
        acc = acc + system.c_lat[idx] * shift2d(psi, di, dj)

    psi_new = acc.at[0].set(jnp.maximum(acc[0], 0.0))
    psi_new = jnp.where(grid.mask, psi_new, 0.0)

    dx = jnp.abs(psi_new - psi)
    apsi = jnp.abs(psi_new)
    weight = jnp.where(apsi > 1.0, 1.0 / apsi, 1.0)
    norm = jnp.sum(jnp.where(grid.mask, dx * weight, 0.0)) / n_nodes
    return psi_new, norm


def stencil_apply(system: LinearSystem, x: jax.Array) -> jax.Array:
    """Apply the preconditioned off-diagonal stencil: ``(C x)_i = sum_j c_ij x_j``.

    ``c_ij = a_ij / diag_i`` as stored by :func:`assemble_system`. Used by the
    conjugate-gradient inner solver (the reference's "lineal" CG/PCG bridge,
    cpusolver.cpp:608-669): the preconditioned matvec is ``D^-1 A x = x - C x``.
    """
    acc = system.c_up * jnp.roll(x, 1, axis=0)
    acc = acc + system.c_down * jnp.roll(x, -1, axis=0)
    for idx, (di, dj) in enumerate(LATERAL_OFFSETS):
        acc = acc + system.c_lat[idx] * shift2d(x, di, dj)
    return acc


def tridiag_vertical_solve(c_up: jax.Array, c_down: jax.Array,
                           rhs: jax.Array) -> jax.Array:
    """Solve ``T z = rhs`` for the VERTICAL tridiagonal part of the
    Jacobi-scaled operator: unit diagonal, sub-diagonal ``-c_up[l]``
    (coupling to layer l-1), super-diagonal ``-c_down[l]`` (to l+1).

    This is the line (block-tridiagonal) preconditioner of the CG inner
    solver: the catchment grid is extremely anisotropic (layer spacings of
    centimetres against lateral cell sizes of metres), so the vertical
    couplings dominate the conditioning; solving them exactly per column
    collapses the stiff direction. The Thomas elimination runs as a
    ``lax.scan`` over the (static, ~11) layer axis with whole-(R,C)-plane
    elementwise ops per layer — batched over every soil column at once,
    and embarrassingly local under the ('row','col') device mesh (the
    vertical axis is never sharded, so no collectives).

    Stability: T is strictly diagonally dominant (c_up + c_down <=
    sum_j a_ij / diag < 1 because diag = C/dt + sum_j a_ij), so the
    elimination needs no pivoting. Masked-out cells have zero couplings
    and reduce to the identity row z = rhs.
    """
    # Unrolled over the static layer axis (L ~ 11): a lax.scan would compile
    # to a 2L-step sequential loop of tiny (R,C) kernels; unrolling lets XLA
    # fuse the whole elimination into a handful of fused elementwise kernels.
    L = rhs.shape[0]
    w = [None] * L
    g = [None] * L
    w_prev = jnp.zeros_like(rhs[0])
    g_prev = jnp.zeros_like(rhs[0])
    for l in range(L):
        denom = 1.0 + c_up[l] * w_prev
        w[l] = -c_down[l] / denom
        g[l] = (rhs[l] + c_up[l] * g_prev) / denom
        w_prev, g_prev = w[l], g[l]

    z = [None] * L
    z[L - 1] = g[L - 1]
    for l in range(L - 2, -1, -1):
        z[l] = g[l] - w[l] * z[l + 1]
    return jnp.stack(z)


def current_mass_balance(grid: Grid, params: SolverParameters,
                         h: jax.Array, se: jax.Array, water_flow: jax.Array,
                         prev_storage: jax.Array, dt: jax.Array):
    """(storage, sink_source_sum, MBE, MBR) for the current step.

    Reference: computeCurrentMassBalance (water.cpp:96-123).
    """
    storage = total_water_content(grid, params, h, se)
    delta_storage = storage - prev_storage
    sink = (jnp.sum(jnp.where(grid.mask, water_flow, 0.0),
                    dtype=jnp.float64) * dt).astype(h.dtype)
    mbe = delta_storage - sink

    time_pct = 0.001 * jnp.maximum(dt, 30.0) / 3600.0
    min_ref = jnp.maximum(storage * time_pct, 0.001)
    ref_water = jnp.maximum(jnp.abs(sink), min_ref)
    mbr = mbe / ref_water
    return storage, sink, mbe, mbr
