"""HectorSLAM pipeline: multi-resolution pyramid + coarse-to-fine Gauss-Newton.

The TPU-native equivalent of HectorSLAMProcessor + MapRepMultiMap + ScanMatcher
(HectorSLAM/Main/*.cs, Matcher/ScanMatcher.cs): state is a pytree holding one
log-odds array per pyramid level; matching runs coarsest -> finest with statically
unrolled GN iterations (the per-level counts are config), all inside ONE jitted
step — the reference's per-scan thread fork/joins (ScanMatcher.cs:154,
MapRepMultiMap.cs:76) disappear into fused array ops.

Pyramid: level i+1 has half the pixels and twice the cell length of level i
(MapRepMultiMap.cs:49-57); every level is updated independently from the raw scan
(not downsampled).  Because level shapes are static, the Python loop over levels
unrolls at trace time and XLA schedules the (data-independent) per-level updates
concurrently — the reference's Parallel.ForEach task parallelism for free.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.config import HectorConfig
from ..core.geometry import deg_diff, normalize_angle, rad_diff
from ..core.scan import Scan
from ..ops import gn, logodds


class HectorState(NamedTuple):
    maps: Tuple[jnp.ndarray, ...]   # per-level f32[S_i * S_i] log-odds, finest first
    match_pose: jnp.ndarray         # f32[3] world
    last_update_pose: jnp.ndarray   # f32[3] world


class HectorInfo(NamedTuple):
    map_updated: jnp.ndarray        # bool


def init(cfg: HectorConfig, start_pose) -> HectorState:
    """Ctor/Reset semantics (HectorSLAMProcessor.cs:66-77, 131-138): zeroed maps,
    match pose at start, last-update pose at float.MinValue so the first scan
    always updates the maps (the squared distance overflows to +inf in f32)."""
    maps = tuple(jnp.zeros((s * s,), jnp.float32) for s in cfg.level_sizes)
    return HectorState(
        maps=maps,
        match_pose=jnp.asarray(start_pose, jnp.float32),
        last_update_pose=jnp.full(3, -3.4028235e38, jnp.float32),
    )


def world_to_map(pose_world: jnp.ndarray, scale_to_map: float,
                 offset) -> jnp.ndarray:
    """GetMapCoordsPose (GridMap.cs:122-137): p_map = p * scale + offset.

    (The reference composes Scale(s) * Translate(offset) in row-vector convention,
    so the offset is applied after scaling; MapRepMultiMap always passes zero.)
    """
    return jnp.stack([pose_world[0] * scale_to_map + offset[0],
                      pose_world[1] * scale_to_map + offset[1],
                      pose_world[2]])


def map_to_world(pose_map: jnp.ndarray, scale_to_map: float,
                 offset) -> jnp.ndarray:
    return jnp.stack([(pose_map[0] - offset[0]) / scale_to_map,
                      (pose_map[1] - offset[1]) / scale_to_map,
                      pose_map[2]])


def match(state_maps: Tuple[jnp.ndarray, ...], scan: Scan,
          hint_pose_world: jnp.ndarray, cfg: HectorConfig) -> jnp.ndarray:
    """ScanMatcher.MatchData over the pyramid (ScanMatcher.cs:41-84): start at the
    coarsest level, per level run EstimateIterations GN steps in map coords,
    normalize heading, feed the estimate to the next-finer level."""
    estimate = hint_pose_world
    any_valid = jnp.any(scan.valid)
    for level in range(cfg.num_levels - 1, -1, -1):
        width = cfg.level_sizes[level]
        scale = 1.0 / cfg.level_resolutions[level]
        est_px = world_to_map(estimate, scale, cfg.offset)
        for _ in range(cfg.estimate_iterations[level]):
            est_px = gn.gn_iteration(state_maps[level], width, scan.points,
                                     scan.valid, est_px, scale, cfg.deriv_clamp)
        est_px = est_px.at[2].set(normalize_angle(est_px[2]))
        estimate = map_to_world(est_px, scale, cfg.offset)
    # empty scan returns the hint (ScanMatcher.cs:82-83)
    return jnp.where(any_valid, estimate, hint_pose_world)


def update_maps(state_maps: Tuple[jnp.ndarray, ...], scan: Scan,
                pose_world: jnp.ndarray, cfg: HectorConfig):
    """MapRepMultiMap.UpdateByScan (MapRepMultiMap.cs:73-77): every level updated
    independently from the raw scan."""
    out = []
    for level in range(cfg.num_levels):
        width = cfg.level_sizes[level]
        scale = 1.0 / cfg.level_resolutions[level]
        out.append(logodds.update_occupancy(
            state_maps[level], width, scan.points, scan.valid, pose_world,
            scan.pose[:2], scale, cfg.log_odds_free, cfg.log_odds_occupied,
            cfg.occupied_cap))
    return tuple(out)


def update(state: HectorState, scan: Scan, pose_hint_world,
           cfg: HectorConfig,
           map_without_matching=False) -> Tuple[HectorState, HectorInfo]:
    """HectorSLAMProcessor.Update (HectorSLAMProcessor.cs:86-126): match (unless
    bootstrapping), then update the maps only if moved beyond the distance/angle
    thresholds or when mapping is forced."""
    pose_hint_world = jnp.asarray(pose_hint_world, jnp.float32)
    force = jnp.asarray(map_without_matching)

    matched = match(state.maps, scan, pose_hint_world, cfg)
    match_pose = jnp.where(force, pose_hint_world, matched)

    dist2 = jnp.sum((match_pose[:2] - state.last_update_pose[:2]) ** 2)
    if cfg.angle_gate_compat:
        # reference quirk: DegDiff (degrees formula) on radian values, SIGNED
        # compare (HectorSLAMProcessor.cs:108) — negative rotations never trigger
        ang_gate = deg_diff(match_pose[2], state.last_update_pose[2]) \
            > cfg.min_angle_diff_for_map_update
    else:
        ang_gate = jnp.abs(rad_diff(match_pose[2], state.last_update_pose[2])) \
            > cfg.min_angle_diff_for_map_update
    do_update = (dist2 > cfg.min_distance_diff_for_map_update ** 2) | ang_gate | force

    def with_update(maps):
        return update_maps(maps, scan, match_pose, cfg)

    new_maps = jax.lax.cond(do_update, with_update, lambda m: m, state.maps)
    new_last = jnp.where(do_update, match_pose, state.last_update_pose)

    return (HectorState(new_maps, match_pose, new_last),
            HectorInfo(map_updated=do_update))
