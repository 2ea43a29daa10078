"""Stencil shift helpers over the (..., R, C) plan dimensions.

``shift(x, di, dj)`` returns ``y`` with ``y[..., i, j] = x[..., i+di, j+dj]``
and a fill value outside the grid. Implemented as pad+slice so that, under
``pjit``/SPMD sharding of the (R, C) dims, XLA lowers the out-of-shard reads to
halo exchange (collective-permute) automatically — this is the TPU-native
replacement for the reference's neighbour-index gathers
(agrolib/soilFluxes3D/types.h:203-216 linkData_t).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from criteria3d_tpu.core.grid import LATERAL_OFFSETS

__all__ = ["shift2d", "shift_all_lateral", "LATERAL_OFFSETS", "MIRROR"]

# index of the mirrored offset: neighbour k of node i sees node i as MIRROR[k]
MIRROR = tuple(LATERAL_OFFSETS.index((-di, -dj)) for (di, dj) in LATERAL_OFFSETS)


def shift2d(x: jax.Array, di: int, dj: int, fill=0.0) -> jax.Array:
    """y[..., i, j] = x[..., i+di, j+dj]; `fill` outside the grid."""
    if di == 0 and dj == 0:
        return x
    pt, pb = max(-di, 0), max(di, 0)
    pl, pr = max(-dj, 0), max(dj, 0)
    pads = [(0, 0)] * (x.ndim - 2) + [(pt, pb), (pl, pr)]
    if x.dtype == jnp.bool_:
        xp = jnp.pad(x, pads, constant_values=bool(fill))
    else:
        xp = jnp.pad(x, pads, constant_values=fill)
    idx = [slice(None)] * (x.ndim - 2)
    idx += [slice(pt + di, pt + di + x.shape[-2]),
            slice(pl + dj, pl + dj + x.shape[-1])]
    return xp[tuple(idx)]


def shift_all_lateral(x: jax.Array, fill=0.0) -> jax.Array:
    """Stack of the 8 lateral-neighbour views: out[k] = shift2d(x, *OFFSETS[k]).

    Output shape ``(8, *x.shape)``.
    """
    return jnp.stack([shift2d(x, di, dj, fill) for (di, dj) in LATERAL_OFFSETS])
