"""Per-link cumulative water-flow getters.

Analogue of the reference's link-flow API (soilFluxes3D.cpp:1126-1216):
``getNodeMaxWaterFlow`` / ``getNodeSumLateralWaterFlow`` /
``getNodeSumLateralWaterFlowIn`` / ``getNodeSumLateralWaterFlowOut`` —
but vectorized: each getter returns the full (L, R, C) map instead of one
node's scalar. Requires ``SolverParameters.track_link_flow=True`` so that
``WaterState.link_flow_sum`` (10, L, R, C) is populated: slots 0=up,
1=down, 2..9 = the 8 lateral directions; positive = inflow [m3].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from criteria3d_tpu.core.state import WaterState

__all__ = ["up_flow", "down_flow", "max_lateral_flow", "sum_lateral_flow",
           "sum_lateral_flow_in", "sum_lateral_flow_out"]


def _require(state: WaterState) -> jax.Array:
    if state.link_flow_sum.ndim != 4:
        raise ValueError(
            "link flows not tracked: set SolverParameters.track_link_flow")
    return state.link_flow_sum


def up_flow(state: WaterState) -> jax.Array:
    """Cumulative flow through each node's UP link [m3]
    (getNodeMaxWaterFlow(Up), soilFluxes3D.cpp:1137-1141)."""
    return _require(state)[0]


def down_flow(state: WaterState) -> jax.Array:
    """Cumulative flow through each node's DOWN link [m3]
    (getNodeMaxWaterFlow(Down), soilFluxes3D.cpp:1142-1146)."""
    return _require(state)[1]


def max_lateral_flow(state: WaterState) -> jax.Array:
    """Max over the 8 lateral links, floored at 0
    (getNodeMaxWaterFlow(Lateral), soilFluxes3D.cpp:1147-1152)."""
    lat = _require(state)[2:]
    return jnp.maximum(jnp.max(lat, axis=0), 0.0)


def sum_lateral_flow(state: WaterState) -> jax.Array:
    """Net lateral exchange per node [m3]
    (getNodeSumLateralWaterFlow, soilFluxes3D.cpp:1162-1176)."""
    return jnp.sum(_require(state)[2:], axis=0)


def sum_lateral_flow_in(state: WaterState) -> jax.Array:
    """Total lateral inflow (positive link sums only)
    (getNodeSumLateralWaterFlowIn, soilFluxes3D.cpp:1182-1196)."""
    lat = _require(state)[2:]
    return jnp.sum(jnp.maximum(lat, 0.0), axis=0)


def sum_lateral_flow_out(state: WaterState) -> jax.Array:
    """Total lateral outflow (negative link sums only)
    (getNodeSumLateralWaterFlowOut, soilFluxes3D.cpp:1202-1216)."""
    lat = _require(state)[2:]
    return jnp.sum(jnp.minimum(lat, 0.0), axis=0)
