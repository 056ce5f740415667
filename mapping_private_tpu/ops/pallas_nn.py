"""Fused nearest-neighbor Pallas kernels — the ICP hot loop at speed of light.

The XLA brute-force path materializes the (Q, N) squared-distance matrix
in HBM (1.6 GB at 20k×20k) and then reduces it, and its row *gather* of
the matched points is slower still (~6.4 ms measured at 20k).  These
kernels tile the computation: each (TQ, TN) distance tile lives only in
VMEM, is reduced to a per-row running (min, argmin) immediately
(flash-attention-style output revisiting across the ref-tile grid axis),
and — in the `nn_gather_pallas` variant — the matched target point and
normal are *selected on the MXU* via a one-hot matmul, so no XLA gather
ever touches HBM-resident indices.

Padding convention: callers pad ref rows with +PAD_COORD and (for the
gather variant) query rows with −PAD_COORD (core.cloud) so padded rows
never win a min and padded queries match nothing.

Replaces every kd-tree NN use on the ICP path (reference
cloud_algos/src/registration.cpp:128 `nearestKSearch`).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TQ = 1024
_TN = 1024
# smaller ref tile for the gather variant: its d2/hits/onehot temporaries
# must fit VMEM alongside the (TQ,8) running-best buffers
_TN_G = 512
_HI = jax.lax.Precision.HIGHEST


def _nn_kernel(q_ref, r_ref, idx_ref, sq_ref):
    j = pl.program_id(1)

    q = q_ref[:]  # (TQ, 8) — xyz padded to 8 lanes
    r = r_ref[:]  # (TN, 8)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)  # (TQ, 1)
    r2 = jnp.sum(r * r, axis=1, keepdims=True).T  # (1, TN)
    # HIGHEST precision: TPU's default f32 matmul uses bf16 passes, whose
    # ~1e-2 error breaks argmin on near-tie neighbor distances.
    cross = jax.lax.dot_general(
        q, r, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_HI,
    )  # (TQ, TN)
    d2 = q2 + r2 - 2.0 * cross

    tile_min = jnp.min(d2, axis=1)  # (TQ,)
    tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + j * _TN

    @pl.when(j == 0)
    def _init():
        sq_ref[:] = tile_min
        idx_ref[:] = tile_arg

    @pl.when(j > 0)
    def _update():
        better = tile_min < sq_ref[:]
        sq_ref[:] = jnp.where(better, tile_min, sq_ref[:])
        idx_ref[:] = jnp.where(better, tile_arg, idx_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_pallas(
    query_xyz: jax.Array, ref_xyz: jax.Array, interpret: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """1-NN: (Q,3),(N,3) → (idx (Q,) int32, sq_dist (Q,) f32).

    Assumes dead ref rows already carry PAD_COORD (PointCloud convention).
    Q and N are padded internally to tile multiples.
    """
    from mapping_private_tpu.core.cloud import PAD_COORD

    q_n = query_xyz.shape[0]
    r_n = ref_xyz.shape[0]
    qp = -(-q_n // _TQ) * _TQ
    rp = -(-r_n // _TN) * _TN
    # pad channel dim 3 → 8 (f32 sublane) and rows with the far sentinel
    q = jnp.full((qp, 8), 0.0, jnp.float32).at[:q_n, :3].set(query_xyz)
    r = jnp.full((rp, 8), PAD_COORD, jnp.float32).at[:r_n, :3].set(ref_xyz)
    r = r.at[:r_n, 3:].set(0.0)

    grid = (qp // _TQ, rp // _TN)
    idx, sq = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TQ, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((_TN, 8), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_TQ,), lambda i, j: (i,)),
            pl.BlockSpec((_TQ,), lambda i, j: (i,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp,), jnp.int32),
            jax.ShapeDtypeStruct((qp,), jnp.float32),
        ],
        interpret=interpret,
    )(q, r)
    return idx[:q_n], sq[:q_n]


def _nn_gather_kernel(q_ref, rt_ref, nt_ref, sq_ref, qsel_ref, nsel_ref):
    j = pl.program_id(1)

    q = q_ref[:]  # (TQ, 8) row-major queries
    rt = rt_ref[:]  # (8, TN) ref points TRANSPOSED: coord rows broadcast
    # Exact f32 distances on the VPU: no matmul, no cancellation, no
    # multi-pass HIGHEST penalty for a K=3 contraction the MXU hates.
    dx = q[:, 0:1] - rt[0:1, :]  # (TQ, TN)
    dy = q[:, 1:2] - rt[1:2, :]
    dz = q[:, 2:3] - rt[2:3, :]
    d2 = dx * dx + dy * dy + dz * dz  # (TQ, TN)

    # Row-min with keepdims (softmax-style broadcast pattern — Mosaic
    # handles this natively; argmin + cross-lane relayout does not).
    tile_min_k = jnp.min(d2, axis=1, keepdims=True)  # (TQ, 1)
    hits = (d2 <= tile_min_k).astype(jnp.float32)
    # average over exact ties (duplicated target points) instead of
    # picking one — identical for true duplicates, harmless otherwise
    onehot = hits / jnp.sum(hits, axis=1, keepdims=True)
    tile_min = tile_min_k[:, 0]  # (TQ,)
    # MXU-as-gather: one-hot rows select the matched target row.
    # K = TN contraction — a shape the MXU likes; HIGHEST keeps the
    # selected coordinates f32-exact through the bf16 passes.
    q_sel = jax.lax.dot_general(
        onehot, rt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )  # (TQ, 8)
    n_sel = jax.lax.dot_general(
        onehot, nt_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )  # (TQ, 8)

    @pl.when(j == 0)
    def _init():
        sq_ref[:] = tile_min
        qsel_ref[:] = q_sel
        nsel_ref[:] = n_sel

    @pl.when(j > 0)
    def _update():
        better = tile_min < sq_ref[:]
        sq_ref[:] = jnp.where(better, tile_min, sq_ref[:])
        qsel_ref[:] = jnp.where(better[:, None], q_sel, qsel_ref[:])
        nsel_ref[:] = jnp.where(better[:, None], n_sel, nsel_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_gather_pallas(
    query_xyz: jax.Array,
    ref_xyz: jax.Array,
    ref_aux: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """1-NN with fused value gather.

    (Q,3),(N,3),(N,3) → (sq_dist (Q,), matched_ref_xyz (Q,3),
    matched_aux (Q,3)).  ``ref_aux`` is typically the target normals.
    Query rows that are dead must carry −PAD_COORD; ref rows +PAD_COORD.
    """
    from mapping_private_tpu.core.cloud import PAD_COORD

    q_n = query_xyz.shape[0]
    r_n = ref_xyz.shape[0]
    qp = -(-q_n // _TQ) * _TQ
    rp = -(-r_n // _TN_G) * _TN_G
    q = jnp.full((qp, 8), -PAD_COORD, jnp.float32).at[:q_n, :3].set(query_xyz)
    q = q.at[:q_n, 3:].set(0.0)
    # refs are passed TRANSPOSED (8, N): per-coordinate rows broadcast
    # against query columns without any in-kernel relayout
    rt = jnp.full((8, rp), PAD_COORD, jnp.float32).at[:3, :r_n].set(ref_xyz.T)
    rt = rt.at[3:, :r_n].set(0.0)
    nt = jnp.zeros((8, rp), jnp.float32).at[:3, :r_n].set(ref_aux.T)

    grid = (qp // _TQ, rp // _TN_G)
    sq, qsel, nsel = pl.pallas_call(
        _nn_gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TQ, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((8, _TN_G), lambda i, j: (0, j)),
            pl.BlockSpec((8, _TN_G), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((_TQ,), lambda i, j: (i,)),
            pl.BlockSpec((_TQ, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((_TQ, 8), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp,), jnp.float32),
            jax.ShapeDtypeStruct((qp, 8), jnp.float32),
            jax.ShapeDtypeStruct((qp, 8), jnp.float32),
        ],
        interpret=interpret,
    )(q, rt, nt)
    return sq[:q_n], qsel[:q_n, :3], nsel[:q_n, :3]
