"""Soil water retention and hydraulic conductivity (van Genuchten / Mualem).

TPU-native re-expression of the reference's per-node soil physics
(agrolib/soilFluxes3D/soilPhysics.cpp:79-279): instead of per-node pointer
lookups into a (soil, horizon) table, soil parameters are materialised once at
grid-build time as dense ``(L, R, C)`` fields (`SoilFields`), so every retention
/ conductivity evaluation in the hot loop is pure element-wise VPU math with no
gathers.

All functions are shape-polymorphic and work on arrays of any shape.
"""

from __future__ import annotations

import dataclasses
import enum

import jax
import jax.numpy as jnp

__all__ = [
    "WRCModel",
    "MeanType",
    "SoilFields",
    "se_from_psi",
    "psi_from_se",
    "theta_from_se",
    "se_from_theta",
    "mualem_conductivity",
    "dtheta_dh",
    "compute_mean",
]


class WRCModel(enum.IntEnum):
    """Water retention curve model (reference types.h:135)."""

    VAN_GENUCHTEN = 0
    MODIFIED_VAN_GENUCHTEN = 1


class MeanType(enum.IntEnum):
    """Inter-node conductivity mean (reference types.h:36)."""

    ARITHMETIC = 0
    GEOMETRIC = 1
    LOGARITHMIC = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SoilFields:
    """Dense per-node soil hydraulic parameters.

    Mirrors soilData_t (reference types.h:104-121) broadcast to node fields.
    All arrays share one shape (typically ``(L, R, C)``); on surface nodes the
    values are unused (masked out by the solver).

    Units follow the reference: alpha [m-1], he [m], k_sat [m s-1].
    """

    vg_alpha: jax.Array
    vg_n: jax.Array
    vg_m: jax.Array
    vg_he: jax.Array      # air-entry potential (modified VG)
    vg_sc: jax.Array      # Sc reduction factor (modified VG)
    theta_s: jax.Array
    theta_r: jax.Array
    k_sat: jax.Array
    mualem_l: jax.Array   # tortuosity
    # Precomputed Mualem denominator 1 - [1 - Sc^(1/m)]^m (the modified-VG
    # normalisation, a pure soil-parameter function): evaluating it per
    # retention pass costs two loop-invariant pow chains per node per
    # Picard iteration on the hot path. Computed ONCE at construction with
    # the same jnp expression mualem_conductivity used, so the value is
    # bitwise identical to the former per-call evaluation.
    mualem_den: jax.Array

    @staticmethod
    def uniform(shape, *, vg_alpha, vg_n, vg_he=0.0, theta_s, theta_r, k_sat,
                mualem_l=0.5, dtype=jnp.float64) -> "SoilFields":
        """Build a spatially-uniform soil field.

        ``vg_m`` is derived as ``1 - 1/n`` and ``vg_sc`` as the modified-VG
        saturation factor ``[1 + (alpha*he)^n]^(-m)`` exactly as the reference
        pedology layer does (agrolib/soil/soil.cpp, vanGenuchten fitting).
        """
        m = 1.0 - 1.0 / vg_n
        sc = (1.0 + (vg_alpha * vg_he) ** vg_n) ** (-m)
        full = lambda v: jnp.full(shape, v, dtype=dtype)
        m_arr, sc_arr = full(m), full(sc)
        den = 1.0 - (1.0 - sc_arr ** (1.0 / m_arr)) ** m_arr
        return SoilFields(
            vg_alpha=full(vg_alpha), vg_n=full(vg_n), vg_m=m_arr,
            vg_he=full(vg_he), vg_sc=sc_arr,
            theta_s=full(theta_s), theta_r=full(theta_r),
            k_sat=full(k_sat), mualem_l=full(mualem_l),
            mualem_den=den,
        )


def se_from_psi(soil: SoilFields, psi: jax.Array, model: WRCModel) -> jax.Array:
    """Degree of saturation from matric potential.

    psi: positive-valued matric potential magnitude [m].
    Reference: computeNodeSe_fromPsi (soilPhysics.cpp:91-115).
    """
    base = (1.0 + (soil.vg_alpha * psi) ** soil.vg_n) ** (-soil.vg_m)
    if model == WRCModel.VAN_GENUCHTEN:
        return base
    # Modified VG: saturated below air-entry he; rescaled by 1/Sc above.
    return jnp.where(psi <= soil.vg_he, 1.0, base / soil.vg_sc)


def psi_from_se(soil: SoilFields, se: jax.Array, model: WRCModel) -> jax.Array:
    """Matric potential magnitude [m] from degree of saturation.

    Reference: computeNodePsi (soilPhysics.cpp:140-158).
    """
    if model == WRCModel.VAN_GENUCHTEN:
        tmp = (1.0 / se) ** (1.0 / soil.vg_m) - 1.0
    else:
        tmp = (1.0 / (se * soil.vg_sc)) ** (1.0 / soil.vg_m) - 1.0
    tmp = jnp.maximum(tmp, 0.0)
    return (1.0 / soil.vg_alpha) * tmp ** (1.0 / soil.vg_n)


def theta_from_se(soil: SoilFields, se: jax.Array) -> jax.Array:
    """Volumetric water content from degree of saturation (soilPhysics.cpp:38-42)."""
    return se * (soil.theta_s - soil.theta_r) + soil.theta_r


def se_from_theta(soil: SoilFields, theta: jax.Array) -> jax.Array:
    """Degree of saturation from volumetric water content (soilPhysics.cpp:123-134)."""
    se = (theta - soil.theta_r) / (soil.theta_s - soil.theta_r)
    return jnp.clip(se, 0.0, 1.0)


def mualem_conductivity(soil: SoilFields, se: jax.Array, model: WRCModel) -> jax.Array:
    """Unsaturated hydraulic conductivity K(Se) [m s-1].

    K(Se) = Ksat * Se^L * {1 - [1 - (Se*Sc)^(1/m)]^m / (1 - [1 - Sc^(1/m)]^m)}^2
    (modified VG; plain VG has Sc = 1). Reference:
    computeMualemSoilConductivity (soilPhysics.cpp:181-214).
    """
    inv_m = 1.0 / soil.vg_m
    # Clamp to avoid nan at se>=1 in the masked-out branch; the saturated
    # branch returns k_sat exactly like the reference's early-out.
    se_c = jnp.clip(se, 1e-12, 1.0)
    if model == WRCModel.VAN_GENUCHTEN:
        num = 1.0 - (1.0 - se_c ** inv_m) ** soil.vg_m
        temp = num
    else:
        sesc = jnp.minimum(se_c * soil.vg_sc, 1.0)
        num = 1.0 - (1.0 - sesc ** inv_m) ** soil.vg_m
        temp = num / soil.mualem_den
    k = soil.k_sat * se_c ** soil.mualem_l * temp * temp
    return jnp.where(se >= 1.0, soil.k_sat, k)


def dtheta_dh(soil: SoilFields, h: jax.Array, h_old: jax.Array, z: jax.Array,
              model: WRCModel) -> jax.Array:
    """Differential water capacity dTheta/dH [m-1].

    Analytic VG derivative when the potential is (numerically) unchanged,
    secant chord |dSe/dH| otherwise — matching computeNode_dTheta_dH
    (soilPhysics.cpp:224-279) including its saturation early-outs.
    """
    psi_curr = jnp.abs(jnp.minimum(0.0, h - z))
    psi_prev = jnp.abs(jnp.minimum(0.0, h_old - z))

    if model == WRCModel.VAN_GENUCHTEN:
        saturated = (psi_curr == 0.0) & (psi_prev == 0.0)
    else:
        saturated = (psi_curr <= soil.vg_he) & (psi_prev <= soil.vg_he)

    # --- analytic branch (|psi_curr - psi_prev| < 1e-12) ---
    n = soil.vg_n
    x = soil.vg_alpha * jnp.maximum(psi_curr, 1e-30)  # avoid 0^neg in pow
    x_pow_n = x ** n
    term1 = (1.0 + x_pow_n) ** (-(soil.vg_m + 1.0))
    term2 = x ** (n - 1.0)
    dse_analytic = soil.vg_alpha * n * soil.vg_m * term1 * term2
    if model == WRCModel.MODIFIED_VAN_GENUCHTEN:
        dse_analytic = dse_analytic / soil.vg_sc

    # --- secant branch ---
    se_curr = se_from_psi(soil, psi_curr, model)
    se_prev = se_from_psi(soil, psi_prev, model)
    dh = h - h_old
    dh_safe = jnp.where(jnp.abs(dh) > 0.0, dh, 1.0)
    dse_secant = jnp.abs((se_curr - se_prev) / dh_safe)

    same = jnp.abs(psi_curr - psi_prev) < 1e-12
    dse = jnp.where(same, dse_analytic, dse_secant)
    dse = jnp.where(saturated, 0.0, dse)
    return dse * (soil.theta_s - soil.theta_r)


def compute_mean(v1: jax.Array, v2: jax.Array, mean_type: MeanType) -> jax.Array:
    """Two-value mean: arithmetic / geometric / logarithmic.

    Reference: otherFunctions.cpp:7-36. The logarithmic mean (default for
    inter-node conductivity) is (v1-v2)/ln(v1/v2), = v1 when equal.
    """
    if mean_type == MeanType.ARITHMETIC:
        return 0.5 * (v1 + v2)
    if mean_type == MeanType.GEOMETRIC:
        sign = jnp.sign(v1)
        return sign * jnp.sqrt(v1 * v2)
    # logarithmic. The naive (v1-v2)/log(v1/v2) is ill-conditioned when
    # v1 ~= v2 (the ratio rounds to 1+delta with O(eps/delta) relative
    # error), which breaks the i<->j symmetry of inter-node conductances.
    # Well-conditioned symmetric form: with d = (hi-lo)/hi computed from the
    # difference (exact to one rounding), log(hi/lo) = -log1p(-d) is accurate
    # for ALL d in (0,1], so (hi-lo)/(-log1p(-d)) has uniform relative
    # accuracy over any dynamic range — including lo = 0 (d=1, log-mean -> 0,
    # as in the reference) — and agrees bit-for-bit in spirit between the
    # f64 parity path and the f32 sweep path.
    v1, v2 = jnp.asarray(v1), jnp.asarray(v2)
    hi = jnp.maximum(v1, v2)
    lo = jnp.minimum(v1, v2)
    hi_safe = jnp.where(hi == 0.0, 1.0, hi)
    d = (hi - lo) / hi_safe
    denom = -jnp.log1p(-jnp.minimum(d, 1.0))
    tiny = d <= jnp.finfo(jnp.result_type(v1, v2)).tiny
    denom = jnp.where(tiny, 1.0, denom)         # avoid 0/0 in the dead branch
    return jnp.where(tiny, hi, (hi - lo) / denom)
