"""Voxel-grid downsampling — scatter-mean per occupied cell.

TPU replacement for `cloud_geometry::downsamplePointCloud` (used at
table_object_detector_passive.cpp:372) and `pcl::VoxelGrid`.  Instead of a
host-side map from cell id → accumulator, points are sorted by a packed
cell key; each run of equal keys becomes one output slot via a cumsum of
run-start flags, and xyz/channels are scatter-added into a fixed-capacity
output.  Everything is static-shape and jit-compatible.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mapping_private_tpu.core.cloud import PAD_COORD, PointCloud
from mapping_private_tpu.ops.neighbors import _cell_key, _KEY_SENTINEL


def voxel_downsample(
    cloud: PointCloud,
    voxel_size: float,
    out_capacity: int,
) -> PointCloud:
    """Downsample to per-voxel centroids.

    Args:
      cloud: input PointCloud (capacity N).
      voxel_size: cell edge length.
      out_capacity: static capacity of the result; occupied voxels beyond
        this many are dropped (choose generously; count is data-dependent).

    Returns:
      PointCloud of voxel centroids with channel means carried over.
    """
    xyz = cloud.xyz
    cs = jnp.asarray(voxel_size, jnp.float32)
    cell = jnp.floor(xyz / cs).astype(jnp.int32)
    keys = jnp.where(cloud.mask, _cell_key(cell), _KEY_SENTINEL)
    order = jnp.argsort(keys)
    skeys = keys[order]
    live = skeys != _KEY_SENTINEL

    # Run-start flags → output slot per sorted point.
    first = jnp.concatenate(
        [jnp.ones((1,), bool), skeys[1:] != skeys[:-1]]
    ) & live
    slot = jnp.cumsum(first.astype(jnp.int32)) - 1  # (N,) slot per point
    slot = jnp.where(live & (slot < out_capacity), slot, out_capacity)  # spill

    def seg_mean(vals: jax.Array) -> Tuple[jax.Array, jax.Array]:
        v = vals[order]
        v2 = v[:, None] if v.ndim == 1 else v
        acc = jnp.zeros((out_capacity + 1, v2.shape[1]), v2.dtype).at[slot].add(
            jnp.where(live[:, None], v2, 0)
        )[:out_capacity]
        return acc

    cnt = (
        jnp.zeros((out_capacity + 1,), jnp.int32)
        .at[slot]
        .add(live.astype(jnp.int32))[:out_capacity]
    )
    denom = jnp.maximum(cnt, 1).astype(jnp.float32)[:, None]
    out_xyz = seg_mean(xyz) / denom
    out_mask = cnt > 0
    out_xyz = jnp.where(out_mask[:, None], out_xyz, PAD_COORD)

    out_channels = {}
    for name, v in cloud.channels.items():
        m = seg_mean(v) / denom
        out_channels[name] = m[:, 0] if v.ndim == 1 else m
    out_channels["vox_count"] = cnt.astype(jnp.float32)
    return PointCloud(xyz=out_xyz, mask=out_mask, channels=out_channels)
