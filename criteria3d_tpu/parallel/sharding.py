"""Multi-chip domain decomposition: 2-D (row, col) sharding over a Mesh.

The reference has no distributed capability (SURVEY.md §2.7); its scaling
dimension is spatial domain size handled by OpenMP/CUDA in shared memory.
Here the same dimension becomes SPMD: every (L, R, C) field is sharded over a
('row', 'col') device mesh with the layer axis local, lateral stencil shifts
lower to halo exchanges (collective-permute) and the solver's scalar
reductions (mass balance, Courant max, Jacobi norm) become cross-chip
all-reduces — inserted automatically by XLA SPMD from the sharding
annotations (GSPMD; the "How to Scale Your Model" recipe).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_pytree", "replicate_pytree",
           "halo_exchange"]


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A ('row', 'col') mesh, factorising the device count as square as possible."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    rows = int(np.floor(np.sqrt(n)))
    while n % rows != 0:
        rows -= 1
    cols = n // rows
    dev_array = np.asarray(devices).reshape(rows, cols)
    return Mesh(dev_array, ("row", "col"))


def _spec_for(leaf, mesh: Mesh) -> P:
    """Shard the trailing two dims when they are divisible by the mesh;
    replicate scalar / per-layer broadcast leaves ((L,1,1), (8,1,1), (1,1)).

    A full-size domain field whose (R, C) do NOT divide the mesh raises:
    silently replicating the whole state would defeat the decomposition —
    pad the DEM first (:func:`pad_to_multiple`).
    """
    shape = getattr(leaf, "shape", ())
    if len(shape) < 2:
        return P()
    r, c = shape[-2], shape[-1]
    mr = mesh.shape["row"]
    mc = mesh.shape["col"]
    if r == 1 and c == 1:
        return P()      # broadcast helper field, replication is free
    if r % mr != 0 or c % mc != 0 or r < mr or c < mc:
        raise ValueError(
            f"field of shape {shape} cannot be sharded over mesh "
            f"{dict(mesh.shape)}: trailing dims ({r}, {c}) must be "
            f"divisible by ({mr}, {mc}). Pad the domain first "
            "(criteria3d_tpu.parallel.sharding.pad_to_multiple).")
    lead = (None,) * (len(shape) - 2)
    return P(*lead, "row", "col")


def shard_pytree(tree, mesh: Mesh):
    """device_put every leaf with its (row, col) sharding."""
    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, _spec_for(leaf, mesh))), tree)


def replicate_pytree(tree, mesh: Mesh):
    return jax.tree.map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree)


def _exchange_axis(a, axis_name: str, dim: int, k: int, size: int):
    """Grow ``a`` by ``k`` cells on both ends of ``dim`` with data from the
    neighbouring shards along mesh axis ``axis_name`` (zeros past the global
    edge — `ppermute` leaves unpaired receivers zero-filled, which matches
    the solver's zero-coefficient out-of-domain convention)."""
    if size == 1:
        pads = [(0, 0)] * a.ndim
        pads[dim] = (k, k)
        return jnp.pad(a, pads)
    n = a.shape[dim]
    lo = lax.slice_in_dim(a, 0, k, axis=dim)
    hi = lax.slice_in_dim(a, n - k, n, axis=dim)
    from_prev = lax.ppermute(hi, axis_name,
                             [(i, i + 1) for i in range(size - 1)])
    from_next = lax.ppermute(lo, axis_name,
                             [(i, i - 1) for i in range(1, size)])
    return jnp.concatenate([from_prev, a, from_next], axis=dim)


def halo_exchange(a, k: int, mesh: Mesh, dims: tuple[int, int] = (-2, -1),
                  axes: tuple[str, str] = ("row", "col")):
    """K-cell halo exchange of a shard-local block over a 2-D mesh.

    For use INSIDE :func:`shard_map`. Returns the block grown by ``k`` on
    all four sides of ``dims``. Column exchange runs first, so the row
    exchange carries the already-grown edges — corner halos arrive via the
    row neighbour without explicit diagonal sends (standard two-phase
    exchange; the 8-point lateral stencil needs the corners).
    """
    dims = tuple(d % a.ndim for d in dims)
    a = _exchange_axis(a, axes[1], dims[1], k, mesh.shape[axes[1]])
    a = _exchange_axis(a, axes[0], dims[0], k, mesh.shape[axes[0]])
    return a


def pad_to_multiple(dem: np.ndarray, multiple_r: int, multiple_c: int,
                    nodata: float = -9999.0) -> np.ndarray:
    """Pad a DEM with nodata so (R, C) divide the mesh shape.

    Masked-out cells cost nothing in the solver, so padding to a shardable
    shape is free accuracy-wise.
    """
    R, C = dem.shape
    pr = (-R) % multiple_r
    pc = (-C) % multiple_c
    if pr == 0 and pc == 0:
        return dem
    return np.pad(dem, ((0, pr), (0, pc)), constant_values=nodata)
