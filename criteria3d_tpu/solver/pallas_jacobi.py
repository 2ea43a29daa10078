"""Pallas TPU kernel: bundled Jacobi sweeps with VMEM-resident coefficients.

The XLA path reads the 11 stencil-coefficient arrays + x from HBM on every
sweep (~13 array passes/sweep). This kernel is the TPU-native analogue of
the reference's fused CUDA SpMV loop (gpusolver.cpp:296-365): it tiles the
(L, R, C) box over row slabs, DMAs each slab's coefficients into VMEM once,
and runs K Jacobi sweeps on-chip before writing back — cutting HBM traffic
per sweep to ~(12/K + 2) passes.

Correctness of the bundling: each slab carries a halo of K rows; after s
sweeps only rows within distance s of the slab edge are stale, so the
central TR rows are exact after K sweeps (redundant-halo / communication-
avoiding scheme). Out-of-domain cells hold zero coefficients, so wrap-around
reads contribute nothing.

Semantics vs the reference: identical fixed point; convergence/divergence is
checked every K sweeps instead of every sweep (a converged system may run up
to K-1 extra no-op sweeps). Used only on the float32 psi-form fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["jacobi_bundle", "jacobi_solve_loop", "SWEEPS_PER_BUNDLE"]

SWEEPS_PER_BUNDLE = 8
_TR = 16          # output rows per slab (TR + 2K must be a multiple of the
                  # f32 sublane tile, 8)


def _roll2(x, shift, axis):
    # pltpu.roll needs a non-negative int32 shift (x64 mode promotes Python
    # ints to i64, which the Mosaic verifier rejects)
    shift = jnp.asarray(shift % x.shape[axis], jnp.int32)
    return pltpu.roll(x, shift=shift, axis=axis)


def _kernel(b_ref, cu_ref, cd_ref, mask_ref, x_ref, clat_ref,
            out_ref, norm_ref, *, K: int, TR: int, L: int, C: int,
            halo: int, R_in: int, C_in: int):
    i = pl.program_id(0)
    slab_rows = TR + 2 * K

    def body(slab, sem):
        # DMA the slab (all inputs share the row window [i*TR, i*TR+slab_rows))
        row0 = i * TR
        i32 = lambda v: jnp.asarray(v, jnp.int32)
        copies = [
            pltpu.make_async_copy(b_ref.at[:, pl.ds(row0, slab_rows), :],
                                  slab.at[i32(0)], sem.at[i32(0)]),
            pltpu.make_async_copy(cu_ref.at[:, pl.ds(row0, slab_rows), :],
                                  slab.at[i32(1)], sem.at[i32(1)]),
            pltpu.make_async_copy(cd_ref.at[:, pl.ds(row0, slab_rows), :],
                                  slab.at[i32(2)], sem.at[i32(2)]),
            pltpu.make_async_copy(mask_ref.at[:, pl.ds(row0, slab_rows), :],
                                  slab.at[i32(3)], sem.at[i32(3)]),
            pltpu.make_async_copy(x_ref.at[:, pl.ds(row0, slab_rows), :],
                                  slab.at[i32(4)], sem.at[i32(4)]),
        ]
        for kk in range(8):
            copies.append(pltpu.make_async_copy(
                clat_ref.at[i32(kk), :, pl.ds(row0, slab_rows), :],
                slab.at[i32(5 + kk)], sem.at[i32(5 + kk)]))
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        b = slab[0]
        cu = slab[1]
        cd = slab[2]
        mask = slab[3]

        # lateral neighbour offsets must match shifts.LATERAL_OFFSETS:
        # (-1,0),(1,0),(0,-1),(0,1),(-1,-1),(-1,1),(1,-1),(1,1)
        offsets = ((-1, 0), (1, 0), (0, -1), (0, 1),
                   (-1, -1), (-1, 1), (1, -1), (1, 1))

        def sweep(x):
            acc = b
            acc = acc + cu * _roll2(x, 1, 0)     # x[l-1]
            acc = acc + cd * _roll2(x, -1, 0)    # x[l+1]
            for kk, (dr, dc) in enumerate(offsets):
                nb = x
                if dr != 0:
                    nb = _roll2(nb, -dr, 1)
                if dc != 0:
                    nb = _roll2(nb, -dc, 2)
                acc = acc + slab[5 + kk] * nb
            # surface clamp: psi >= 0 on layer 0 (x >= z in head form)
            surf = jnp.maximum(acc[0:1], 0.0)
            acc = jnp.concatenate([surf, acc[1:]], axis=0)
            return acc * mask

        x = slab[4]
        for s in range(K - 1):
            x = sweep(x)
        x_prev = x
        x = sweep(x)

        # psi-weighted L1 norm of the LAST sweep, central rows only
        dx = jnp.abs(x - x_prev)
        apsi = jnp.abs(x)
        w = jnp.where(apsi > 1.0, 1.0 / apsi, 1.0)
        contrib = (dx * w * mask)[:, K:K + TR, :]
        if halo > 0:
            # sharded mode: the outer `halo` ring of the input block is
            # neighbour-owned (redundant) — exclude it so the cross-device
            # psum of the norm counts every node exactly once. Input row of
            # contrib row r is i*TR + r (cols are not offset by padding).
            rr = lax.broadcasted_iota(jnp.int32, contrib.shape, 1) + i * TR
            cc = lax.broadcasted_iota(jnp.int32, contrib.shape, 2)
            inside = ((rr >= halo) & (rr < R_in - halo)
                      & (cc >= halo) & (cc < C_in - halo))
            contrib = jnp.where(inside, contrib, 0.0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        norm_block = jnp.where((rows == 0) & (cols == 0),
                               jnp.sum(contrib), 0.0)
        norm_ref[0, :, :] = norm_block

        out_ref[:, :, :] = x[:, K:K + TR, :]

    pl.run_scoped(
        body,
        slab=pltpu.VMEM((13, L, slab_rows, C), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((13,)),
    )


def jacobi_bundle(b, c_up, c_down, c_lat, mask_f, x,
                  K: int = SWEEPS_PER_BUNDLE, TR: int = _TR,
                  halo: int = 0, interpret: bool | None = None):
    """Run K Jacobi sweeps; returns (x_new, last_sweep_norm_sum).

    All arrays float32; b/c_up/c_down/mask_f/x are (L, R, C), c_lat is
    (8, L, R, C). R and C need not be aligned — padding is applied here.

    ``halo`` > 0 marks the outer ring of the block as neighbour-owned
    (sharded redundant-halo mode): those cells still sweep (they must, to
    keep the interior exact for up to ``halo`` sweeps) but are excluded from
    the norm sum. ``interpret`` runs the kernel through the Pallas
    interpreter — default: automatic on non-TPU backends, so the sharded
    path is testable on a virtual CPU mesh.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L, R, C = x.shape
    # pad rows so R is a multiple of TR, plus K halo rows on both sides;
    # pad C to the f32 lane tile (128)
    Rp = ((R + TR - 1) // TR) * TR
    Cp = ((C + 127) // 128) * 128
    pr = Rp - R
    pc = Cp - C

    def pad3(a):
        return jnp.pad(a, ((0, 0), (K, K + pr), (0, pc)))

    def pad4(a):
        return jnp.pad(a, ((0, 0), (0, 0), (K, K + pr), (0, pc)))

    b_p, cu_p, cd_p, m_p, x_p = (pad3(a) for a in (b, c_up, c_down, mask_f, x))
    cl_p = pad4(c_lat)

    nblocks = Rp // TR
    kernel = functools.partial(_kernel, K=K, TR=TR, L=L, C=Cp,
                               halo=halo, R_in=R, C_in=C)

    out, norms = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=[
            # index_map components must share the program-id dtype (int32);
            # Python ints would promote to i64 under x64 mode and fail Mosaic
            pl.BlockSpec((L, TR, Cp),
                         lambda i: (jnp.zeros((), jnp.int32), i,
                                    jnp.zeros((), jnp.int32)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128),
                         lambda i: (i, jnp.zeros((), jnp.int32),
                                    jnp.zeros((), jnp.int32)),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, Rp, Cp), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, 8, 128), jnp.float32),
        ],
    )(b_p, cu_p, cd_p, m_p, x_p, cl_p)

    return out[:, :R, :C], jnp.sum(norms[:, 0, 0])


def jacobi_solve_loop(b, c_up, c_down, c_lat, mask_f, x0,
                      max_iter, tol, n_nodes: int, mesh=None,
                      K: int = SWEEPS_PER_BUNDLE):
    """Iterate Pallas sweep bundles to convergence; returns (x, diverged, n_it).

    Same convergence contract as the XLA sweep loop in
    :func:`criteria3d_tpu.solver.step._jacobi_solve` (solveLinearSystem,
    cpusolver.cpp:672-703): stop when the psi-weighted mean |dx| of the last
    sweep drops below ``tol``, abort as diverged past 10x the best norm seen,
    cap at ``max_iter`` sweeps counted in K-sweep bundles.

    With ``mesh`` (a ('row','col') :class:`jax.sharding.Mesh`) the WHOLE loop
    runs under ``shard_map``: the stencil coefficients are halo-exchanged
    once (they are constant across the solve), each bundle exchanges only x
    (K rows/cols per side — the redundant-halo scheme tolerates K stale edge
    cells per bundle), and the norm is a cross-device ``psum`` restricted to
    owner cells. This is the production fast path's multi-chip form — the
    TPU-native analogue of the reference's fully device-resident GPU loop
    (gpusolver.cpp:106-135) extended across chips over ICI.
    """
    tol = jnp.asarray(tol, jnp.float32)

    def run_loop(b, cu, cd, cl, m, x, max_iter, tol, exchange=None,
                 norm_reduce=None, halo=0):
        if exchange is not None:
            b, cu, cd, m = exchange(b), exchange(cu), exchange(cd), exchange(m)
            cl = exchange(cl)

        def cond(c):
            _, it, _, done, _ = c
            return jnp.logical_and(~done, it < max_iter)

        def body(c):
            x, it, best, done, diverged = c
            xh = exchange(x) if exchange is not None else x
            out, norm_sum = jacobi_bundle(b, cu, cd, cl, m, xh,
                                          K=K, halo=halo)
            if exchange is not None:
                out = out[:, halo:-halo, halo:-halo]
            if norm_reduce is not None:
                norm_sum = norm_reduce(norm_sum)
            norm = norm_sum / n_nodes
            converged = norm < tol
            div = jnp.logical_and(~converged, norm > best * 10.0)
            best = jnp.minimum(best, norm)
            return (out, it + K, best, converged | div, div)

        best0 = jnp.ones((), x.dtype)
        x, n_it, _, _, diverged = lax.while_loop(
            cond, body, (x, jnp.zeros((), jnp.int32), best0,
                         jnp.zeros((), bool), jnp.zeros((), bool)))
        return x, diverged, n_it

    if mesh is None:
        return run_loop(b, c_up, c_down, c_lat, mask_f, x0, max_iter, tol)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from criteria3d_tpu.parallel.sharding import halo_exchange

    def exchange(a):
        return halo_exchange(a, K, mesh, dims=(-2, -1), axes=("row", "col"))

    def norm_reduce(s):
        return lax.psum(s, ("row", "col"))

    def local(b, cu, cd, cl, m, x, max_iter, tol):
        return run_loop(b, cu, cd, cl, m, x, max_iter, tol,
                        exchange=exchange, norm_reduce=norm_reduce, halo=K)

    s3 = P(None, "row", "col")
    s4 = P(None, None, "row", "col")
    # check_vma off: pallas_call outputs carry no varying-mesh-axes info,
    # and the replication of the scalar outputs is established manually by
    # the psum above.
    return shard_map(local, mesh=mesh,
                     in_specs=(s3, s3, s3, s4, s3, s3, P(), P()),
                     out_specs=(s3, P(), P()), check_vma=False)(
        b, c_up, c_down, c_lat, mask_f, x0,
        jnp.asarray(max_iter, jnp.int32), tol)
