"""Sequential Hough-voting shape segmentation — `hough_segmentation` TPU-native.

Replaces the reference's largest package (hough_segmentation/src/
sequential_hough.cpp, 7.6k LoC): per scene it repeatedly (a) runs many
adaptive RANSAC line/circle fits on the table-projected 2D points
(ransac.hpp fitLine :75-104 / fitCircle :127-191), (b) votes each fitted
model into a parameter space (line/circle parameter clustering,
sequential_hough.cpp:4392-4515), (c) takes the model with the most votes,
grows its inliers vertically, estimates a cuboid (:4554-6102) or cylinder
(:6103-6356), removes the inliers and repeats (the `while continue_hough`
loop :3920), finally classifying each object as tall/medium/short/flat
(:3727-3816, thresholds :181-189).

TPU formulation: the serial VRANSAC iterations become H parallel
hypotheses; parameter-space voting is a quantize + scatter-add where each
hypothesis votes with its inlier count; the winning cell's hypotheses are
averaged (the reference's cluster-mean model).  Each extraction round is
one jitted program with static shapes; the short sequential outer loop
(one iteration per extracted object) runs on the host exactly as the
reference's does, carrying only a live-point mask across rounds.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mapping_private_tpu.core.cloud import PointCloud
from mapping_private_tpu.fit.box import OrientedBox, fit_box_zup
from mapping_private_tpu.fit.ransac import sample_live_indices
from mapping_private_tpu.ops.region_growing import region_grow


@dataclasses.dataclass(frozen=True)
class HoughConfig:
    num_hypotheses: int = 512
    line_threshold: float = 0.01  # sequential_hough.cpp:113
    circle_threshold: float = 0.01  # :114
    min_radius: float = 0.010
    max_radius: float = 0.100
    max_objects: int = 5
    min_inliers: int = 50
    # parameter-space quantization (clustering tolerance, :142-143)
    rho_bin: float = 0.01
    theta_bins: int = 90
    center_bin: float = 0.01
    radius_bin: float = 0.005
    grow_xy_margin: float = 0.015  # vertical growth corridor around the model
    # size classification (:181-189)
    flat_value: float = 0.25
    tall_value: float = 0.75
    medium_value: float = 0.50
    short_value: float = 0.25


@dataclasses.dataclass
class HoughSegment:
    kind: str  # 'cuboid' | 'cylinder'
    size_class: str  # 'tall' | 'medium' | 'short' | 'flat'
    inliers: np.ndarray  # (N,) bool
    num_inliers: int
    box: Optional[OrientedBox] = None  # cuboid params
    cylinder: Optional[Tuple[np.ndarray, float, float, float]] = None
    # cylinder = (center_xy, radius, z_min, z_max)
    votes: int = 0


def _line_hypotheses(xy, mask, key, H, threshold):
    """H 2-point line hypotheses → params (rho ≥ 0, theta), inlier counts."""
    idx = sample_live_indices(key, mask, (H, 2))
    p0, p1 = xy[idx[:, 0]], xy[idx[:, 1]]
    t = p1 - p0
    tlen = jnp.linalg.norm(t, axis=-1, keepdims=True)
    ok = tlen[:, 0] > 1e-9
    t = t / jnp.maximum(tlen, 1e-30)
    nrm = jnp.stack([-t[:, 1], t[:, 0]], axis=-1)  # (H,2)
    c = -jnp.sum(nrm * p0, axis=-1)
    # canonicalize: rho = −c ≥ 0 with nrm flipped accordingly (Hough form)
    flip = jnp.where(c > 0, -1.0, 1.0)[:, None]
    nrm = nrm * flip
    rho = jnp.abs(c)
    theta = jnp.arctan2(nrm[:, 1], nrm[:, 0])  # (−π, π]
    d = jnp.abs(xy @ nrm.T + (-rho)[None, :]).T  # (H,N)
    counts = jnp.sum(((d < threshold) & mask[None, :]).astype(jnp.int32), axis=1)
    counts = jnp.where(ok, counts, 0)
    return nrm, rho, theta, counts


def _circle_hypotheses(xy, mask, key, H, threshold, rmin, rmax):
    idx = sample_live_indices(key, mask, (H, 3))
    a, b, c3 = xy[idx[:, 0]], xy[idx[:, 1]], xy[idx[:, 2]]
    d = 2.0 * (
        a[:, 0] * (b[:, 1] - c3[:, 1])
        + b[:, 0] * (c3[:, 1] - a[:, 1])
        + c3[:, 0] * (a[:, 1] - b[:, 1])
    )
    ok = jnp.abs(d) > 1e-12
    d = jnp.where(ok, d, 1.0)
    a2, b2, c2 = jnp.sum(a * a, -1), jnp.sum(b * b, -1), jnp.sum(c3 * c3, -1)
    ux = (a2 * (b[:, 1] - c3[:, 1]) + b2 * (c3[:, 1] - a[:, 1]) + c2 * (a[:, 1] - b[:, 1])) / d
    uy = (a2 * (c3[:, 0] - b[:, 0]) + b2 * (a[:, 0] - c3[:, 0]) + c2 * (b[:, 0] - a[:, 0])) / d
    center = jnp.stack([ux, uy], -1)
    radius = jnp.linalg.norm(a - center, axis=-1)
    ok = ok & (radius >= rmin) & (radius <= rmax)
    dc = jnp.linalg.norm(xy[None, :, :] - center[:, None, :], axis=-1)
    dd = jnp.abs(dc - radius[:, None])
    counts = jnp.sum(((dd < threshold) & mask[None, :]).astype(jnp.int32), axis=1)
    counts = jnp.where(ok, counts, 0)
    return center, radius, counts


def _vote_argmax(bin_ids: jax.Array, weights: jax.Array, num_bins: int):
    """Scatter-add weights into bins; return (best_bin, votes)."""
    acc = jnp.zeros((num_bins,), jnp.int32).at[bin_ids].add(weights)
    best = jnp.argmax(acc)
    return best, acc[best]


@partial(jax.jit, static_argnums=(3,))
def _hough_round(xy, mask, key, cfg: HoughConfig):
    """One extraction round.  Returns a dict of both candidates' params,
    votes, and inlier masks; winner selection happens on the host."""
    kl, kc = jax.random.split(key)
    H = cfg.num_hypotheses

    # --- lines: vote in (rho, theta) parameter space ------------------------
    nrm, rho, theta, lc = _line_hypotheses(xy, mask, kl, H, cfg.line_threshold)
    rho_id = jnp.clip((rho / cfg.rho_bin).astype(jnp.int32), 0, 999)
    th_id = jnp.clip(
        ((theta + jnp.pi) / (2 * jnp.pi) * cfg.theta_bins).astype(jnp.int32),
        0, cfg.theta_bins - 1,
    )
    line_bins = rho_id * cfg.theta_bins + th_id
    lbest, lvotes = _vote_argmax(line_bins, lc, 1000 * cfg.theta_bins)
    in_bin = (line_bins == lbest) & (lc > 0)
    w = in_bin.astype(jnp.float32) * lc.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    line_n = jnp.sum(nrm * w[:, None], axis=0) / wsum
    line_n = line_n / jnp.maximum(jnp.linalg.norm(line_n), 1e-12)
    line_rho = jnp.sum(rho * w) / wsum
    line_d = jnp.abs(xy @ line_n - line_rho)
    line_inl = (line_d < cfg.line_threshold) & mask
    line_count = jnp.sum(line_inl.astype(jnp.int32))

    # --- circles: vote in (cx, cy, r) parameter space -----------------------
    center, radius, cc = _circle_hypotheses(
        xy, mask, kc, H, cfg.circle_threshold, cfg.min_radius, cfg.max_radius
    )
    cx_id = jnp.clip(((center[:, 0] + 5.0) / cfg.center_bin).astype(jnp.int32), 0, 1023)
    cy_id = jnp.clip(((center[:, 1] + 5.0) / cfg.center_bin).astype(jnp.int32), 0, 1023)
    r_id = jnp.clip((radius / cfg.radius_bin).astype(jnp.int32), 0, 63)
    circ_bins = (cx_id * 1024 + cy_id) * 64 + r_id
    # hash the huge id space into 1<<20 buckets (collisions only merge votes)
    circ_bins = (circ_bins * jnp.int32(-1640531535)) & ((1 << 20) - 1)  # Knuth 2654435761 as i32
    cbest, cvotes = _vote_argmax(circ_bins, cc, 1 << 20)
    cin = (circ_bins == cbest) & (cc > 0)
    cw = cin.astype(jnp.float32) * cc.astype(jnp.float32)
    cwsum = jnp.maximum(jnp.sum(cw), 1e-9)
    circ_c = jnp.sum(center * cw[:, None], axis=0) / cwsum
    circ_r = jnp.sum(radius * cw) / cwsum
    circ_d = jnp.abs(jnp.linalg.norm(xy - circ_c, axis=-1) - circ_r)
    circ_inl = (circ_d < cfg.circle_threshold) & mask
    # grow: also claim interior points (objects are filled when seen top-down)
    circ_grow = (
        jnp.linalg.norm(xy - circ_c, axis=-1) < circ_r + cfg.grow_xy_margin
    ) & mask
    circ_count = jnp.sum(circ_inl.astype(jnp.int32))

    # line growth corridor: within threshold+margin of the line
    line_grow = (line_d < cfg.line_threshold + cfg.grow_xy_margin) & mask

    return dict(
        line_votes=lvotes, line_count=line_count, line_inl=line_inl,
        line_grow=line_grow, line_n=line_n, line_rho=line_rho,
        circ_votes=cvotes, circ_count=circ_count, circ_inl=circ_inl,
        circ_grow=circ_grow, circ_c=circ_c, circ_r=circ_r,
    )


def _classify_size(extents: np.ndarray, cfg: HoughConfig) -> str:
    """tall/medium/short/flat classification (sequential_hough.cpp:3727-3816).

    The reference's formula (smallest/(medium+biggest) < flat_value) also
    fires on tall thin objects (its :1048 comment admits excluding "the
    tall cylinder on the left"); here flat additionally requires the
    *height* to be the small dimension — a pancake, not a pole.  Heights
    compare against tall/medium_value (:187-189)."""
    e = np.asarray(extents, np.float64)
    height = float(e[2])
    footprint = np.sort(e[:2])
    is_smallest = height <= footprint[0] + 1e-9
    if is_smallest and height / max(footprint.sum(), 1e-9) < cfg.flat_value:
        return "flat"
    if height > cfg.tall_value:
        return "tall"
    if height > cfg.medium_value:
        return "medium"
    return "short"


def hough_segment(
    cloud: PointCloud,
    key: jax.Array,
    cfg: HoughConfig = HoughConfig(),
    table_z: Optional[float] = None,
) -> List[HoughSegment]:
    """Sequentially extract cuboid/cylinder objects from a tabletop cloud.

    The cloud should already be table-relative (or pass table_z to subtract).
    Returns segments best-first; each claims a disjoint set of points.
    """
    xyz = np.asarray(cloud.padded_xyz())
    z_off = float(table_z) if table_z is not None else 0.0
    xy = jnp.asarray(xyz[:, :2])
    z = xyz[:, 2] - z_off
    live = jnp.asarray(np.asarray(cloud.mask))

    segments: List[HoughSegment] = []
    for it in range(cfg.max_objects):
        if int(jnp.sum(live.astype(jnp.int32))) < cfg.min_inliers:
            break
        key, sub = jax.random.split(key)
        r = _hough_round(xy, live, sub, cfg)
        lv, cv = int(r["line_votes"]), int(r["circ_votes"])
        lcount, ccount = int(r["line_count"]), int(r["circ_count"])
        if max(lcount, ccount) < cfg.min_inliers:
            break
        use_circle = (cv, ccount) > (lv, lcount)
        if use_circle:
            claimed = np.asarray(r["circ_grow"])
            zi = z[claimed]
            center = np.asarray(r["circ_c"])
            seg_extents = np.array(
                [2 * float(r["circ_r"]), 2 * float(r["circ_r"]), zi.max() - max(zi.min(), 0.0)]
            )
            seg = HoughSegment(
                kind="cylinder",
                size_class=_classify_size(seg_extents, cfg),
                inliers=claimed,
                num_inliers=int(claimed.sum()),
                cylinder=(center, float(r["circ_r"]), float(zi.min()), float(zi.max())),
                votes=cv,
            )
        else:
            # grow the full connected object from the line-corridor seed
            # (the reference's region-grow of winner inliers, :2827-2900)
            seeds = r["line_grow"]
            labels = region_grow(
                jnp.asarray(xyz), live, radius=cfg.grow_xy_margin * 2,
                seed_mask=seeds,
            )
            # an infinite 2D line seeds every object it crosses — keep only
            # the region holding the most line inliers (the reference
            # clusters line inliers and keeps the winning cluster, :2827+)
            lab = np.asarray(labels)
            n_cap = labels.shape[0]
            seeded = lab < n_cap
            if seeded.any():
                seed_np = np.asarray(seeds)
                counts = np.bincount(
                    lab[seeded & seed_np], minlength=n_cap + 1
                )
                best_region = int(counts.argmax())
                claimed = lab == best_region
            else:
                claimed = np.asarray(seeds)
            sel = jnp.asarray(claimed)
            box = fit_box_zup(jnp.asarray(xyz), sel)
            extents = np.asarray(box.extents)
            seg = HoughSegment(
                kind="cuboid",
                size_class=_classify_size(extents, cfg),
                inliers=claimed,
                num_inliers=int(claimed.sum()),
                box=box,
                votes=lv,
            )
        if seg.num_inliers < cfg.min_inliers:
            break
        segments.append(seg)
        live = live & ~jnp.asarray(claimed)
    return segments
