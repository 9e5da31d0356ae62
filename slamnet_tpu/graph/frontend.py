"""Pose-graph frontend: keyframe selection, scan-to-scan matching, loop closures.

Constraints come from the same kernels as the Hector matcher: a keyframe's scan is
rasterized into a small local occupancy grid (ops.logodds) and another scan is
Gauss-Newton matched against it (ops.gn) — scan-to-scan relative poses without
any new kernel code.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.geometry import normalize_angle, pose_between
from ..core.scan import Scan
from ..ops import gn, logodds


class ScanMatchConfig(NamedTuple):
    """Local grid + matcher settings for scan-to-scan constraints."""

    grid_size: int = 128        # local grid pixels
    resolution: float = 0.25    # m/px — local grid spans 32 m
    gn_iterations: int = 20
    log_odds_free: float = -0.40546511
    log_odds_occupied: float = 2.19722458


def rasterize_scan(scan: Scan, cfg: ScanMatchConfig) -> jnp.ndarray:
    """Build a local log-odds grid from one scan, robot at the grid center."""
    s = cfg.grid_size
    center = jnp.asarray([s // 2 * cfg.resolution, s // 2 * cfg.resolution, 0.0])
    grid = jnp.zeros((s * s,), jnp.float32)
    return logodds.update_occupancy(
        grid, s, scan.points, scan.valid, center, scan.pose[:2],
        1.0 / cfg.resolution, cfg.log_odds_free, cfg.log_odds_occupied)


def match_scans(scan_ref: Scan, scan_qry: Scan, init_rel,
                cfg: ScanMatchConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Relative pose of scan_qry's robot in scan_ref's frame.

    Rasterizes scan_ref at the center of a local grid, then GN-matches scan_qry
    starting from `init_rel` (e.g. the odometry delta or the pose-graph guess).
    Returns (rel_pose f32[3], residual f32 — mean 1-p at the matched pose).
    """
    s = cfg.grid_size
    scale = 1.0 / cfg.resolution
    grid = rasterize_scan(scan_ref, cfg)
    center = jnp.asarray([s // 2 * cfg.resolution, s // 2 * cfg.resolution])

    init = jnp.asarray(init_rel, jnp.float32)
    pose_px = jnp.stack([(init[0] + center[0]) * scale,
                         (init[1] + center[1]) * scale, init[2]])
    for _ in range(cfg.gn_iterations):
        pose_px = gn.fused_gn_iteration(grid, 0, s, scale, pose_px,
                                        scan_qry.points[:, 0],
                                        scan_qry.points[:, 1], scan_qry.valid)
    rel = jnp.stack([pose_px[0] / scale - center[0],
                     pose_px[1] / scale - center[1],
                     normalize_angle(pose_px[2])])

    # residual: mean (1 - map probability) over the matched query points
    H, dtr = gn.hessian_derivs(grid, s, scan_qry.points, scan_qry.valid,
                               pose_px, scale)
    # cheap quality proxy: gradient magnitude near zero + use dtr norm
    resid = jnp.linalg.norm(dtr) / jnp.maximum(jnp.sum(scan_qry.valid), 1)
    return rel, resid


def keyframe_due(last_kf_pose, pose, dist_thresh: float,
                 angle_thresh: float) -> jnp.ndarray:
    """Spawn a new keyframe when moved far enough from the last one."""
    d = jnp.linalg.norm(pose[:2] - last_kf_pose[:2])
    a = jnp.abs(normalize_angle(pose[2] - last_kf_pose[2]))
    return (d > dist_thresh) | (a > angle_thresh)


def loop_candidates(poses: jnp.ndarray, node_valid: jnp.ndarray,
                    cur_idx, radius: float, min_index_gap: int) -> jnp.ndarray:
    """bool[K] mask of keyframes within `radius` of node `cur_idx` but at least
    `min_index_gap` older — loop-closure candidates by proximity."""
    cur = poses[cur_idx]
    d = jnp.linalg.norm(poses[:, :2] - cur[None, :2], axis=1)
    idx = jnp.arange(poses.shape[0])
    return node_valid & (d < radius) & (idx < cur_idx - min_index_gap)
