"""Log-odds occupancy update — Hector's hot loop #4 as an order-independent scatter.

Reference: OccGridMap.UpdateByScan + UpdateLineBresenhami + BresenhamCellFree/Occ
(OccGridMap.cs:114-239).  The reference walks each beam marking free cells
(+logOddsFree, at most once per scan via the UpdateIndex generation counter) and
the endpoint occupied (+logOddsOccupied, capped at value < 50, REVERTING a
same-scan free mark first).

Those generation-counter rules make the per-scan result independent of beam order:

  cell in occ set                -> + logOddsOccupied if value < 50
  cell in free set, not occ set  -> + logOddsFree

so the whole scan becomes two scattered boolean masks + one vectorized update —
exact (bit-for-bit) vs the sequential semantics, verified in tests/test_hector_ops.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.geometry import dotnet_round
from .rasterize import hector_line_cells


def update_occupancy(logodds_flat: jnp.ndarray, width: int, points: jnp.ndarray,
                     valid: jnp.ndarray, robot_pose_world: jnp.ndarray,
                     scan_pose: jnp.ndarray, scale_to_map: float,
                     log_odds_free: float, log_odds_occupied: float,
                     occupied_cap: float = 50.0) -> jnp.ndarray:
    """One scan's occupancy update; returns new f32[width*width] log-odds map.

    Geometry per UpdateByScan (OccGridMap.cs:119-141): p_map = (R(theta)*p + t) *
    scale_to_map rounded half-to-even (.NET ToRoundPoint); beam start is the
    transformed scan-cloud pose (zero in the simulator => the robot cell); beams
    with begin == end or with either end outside the dimensions are skipped.
    """
    theta = robot_pose_world[2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    tx, ty = robot_pose_world[0], robot_pose_world[1]

    bx = (c * scan_pose[0] - s * scan_pose[1] + tx) * scale_to_map
    by = (s * scan_pose[0] + c * scan_pose[1] + ty) * scale_to_map
    begin = jnp.stack([dotnet_round(bx), dotnet_round(by)])

    ex = (c * points[:, 0] - s * points[:, 1] + tx) * scale_to_map
    ey = (s * points[:, 0] + c * points[:, 1] + ty) * scale_to_map
    end = jnp.stack([dotnet_round(ex), dotnet_round(ey)], axis=1)

    n = points.shape[0]
    begin_b = jnp.broadcast_to(begin, (n, 2))
    same = (end[:, 0] == begin[0]) & (end[:, 1] == begin[1])
    in_dims = lambda p: ((p[..., 0] >= 0) & (p[..., 0] < width) &
                         (p[..., 1] >= 0) & (p[..., 1] < width))
    beam_ok = valid & ~same & in_dims(begin_b) & in_dims(end)

    cells = hector_line_cells(begin_b, end, width, max_steps=width)
    fmask = cells.mask & beam_ok[:, None]

    ncells = width * width
    free = jnp.zeros(ncells, jnp.int32).at[
        jnp.where(fmask, cells.flat, 0).reshape(-1)].max(
        fmask.reshape(-1).astype(jnp.int32))
    end_flat = end[:, 1] * width + end[:, 0]
    occ = jnp.zeros(ncells, jnp.int32).at[
        jnp.where(beam_ok, end_flat, 0)].max(beam_ok.astype(jnp.int32))

    is_occ = occ > 0
    is_free = (free > 0) & ~is_occ
    return (logodds_flat
            + jnp.where(is_free, log_odds_free, 0.0)
            + jnp.where(is_occ & (logodds_flat < occupied_cap),
                        log_odds_occupied, 0.0))
