"""Map-row tiling with halo exchange — grid memory sharded across devices.

The long-context story of SURVEY.md §5.7/§5.8: a global occupancy grid too large
for one device is row-sharded over the 'tile' mesh axis.  Bilinear interpolation
reads rows y0 and y0+1 (ScanMatcher.cs:230-233 — the reason for the reference's
``Limits = Dimensions-2`` margin), so each device keeps its owned rows plus ONE
halo row mirroring the south neighbor's first row, refreshed with a single
ppermute after every map update — the ring-exchange pattern for grids.

Beam geometry is replicated (cheap); only grid METMORY and gather/scatter work are
sharded.  All functions ending in ``_local`` run inside shard_map.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.geometry import dotnet_round
from ..ops import gn
from ..ops.rasterize import hector_line_cells


def halo_exchange_local(local: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Refresh the bottom halo row from the south neighbor's first owned row.

    local: f32[rows+1, W] (last row is the halo).  The last tile's halo receives
    zeros (it is never read: bilinear y0 <= H-2 keeps reads inside the last tile).
    """
    n = jax.lax.axis_size(axis)
    first_owned = local[0]
    perm = [(i, i - 1) for i in range(1, n)]
    halo = jax.lax.ppermute(first_owned, axis, perm)
    return local.at[-1].set(halo)


def tiled_hessian_derivs_local(local: jnp.ndarray, width: int, rows: int,
                               points: jnp.ndarray, valid: jnp.ndarray,
                               pose_px: jnp.ndarray, scale_to_map: float,
                               axis: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Partial (H, dTr) from the points landing in this tile's rows, psum'd.

    local: f32[rows+1, W] owned rows + halo.  Semantically identical to the dense
    ops.gn.hessian_derivs on the full grid.
    """
    tile = jax.lax.axis_index(axis)
    r0 = tile * rows
    height = rows * jax.lax.axis_size(axis)

    theta = pose_px[2]
    sin_r = jnp.sin(theta) * scale_to_map
    cos_r = jnp.cos(theta) * scale_to_map
    X, Y = points[:, 0], points[:, 1]
    mx = cos_r * X - sin_r * Y + pose_px[0]
    my = sin_r * X + cos_r * Y + pose_px[1]

    in_b = (valid & (mx >= 0.0) & (mx <= width - 2) & (my >= 0.0)
            & (my <= height - 2))
    x0 = jnp.clip(mx.astype(jnp.int32), 0, width - 2)
    y0 = jnp.clip(my.astype(jnp.int32), 0, height - 2)
    mine = in_b & (y0 >= r0) & (y0 < r0 + rows)
    ly = jnp.where(mine, y0 - r0, 0)
    lx = jnp.where(mine, x0, 0)

    flat = local.reshape(-1)
    base = ly * width + lx
    idx = jnp.stack([base, base + 1, base + width, base + width + 1])
    v = jax.nn.sigmoid(jnp.take(flat, idx))
    fx = mx - x0
    fy = my - y0
    xf, yf = 1.0 - fx, 1.0 - fy
    val = (v[0] * xf + v[1] * fx) * yf + (v[2] * xf + v[3] * fx) * fy
    gx = -((v[0] - v[1]) * xf + (v[2] - v[3]) * fx)
    gy = -((v[0] - v[2]) * yf + (v[1] - v[3]) * fy)
    z = jnp.float32(0.0)
    gx = jnp.where(mine, gx, z)
    gy = jnp.where(mine, gy, z)
    fun = jnp.where(mine, 1.0 - val, z)
    rot = (-sin_r * X - cos_r * Y) * gx + (cos_r * X - sin_r * Y) * gy

    P9 = jnp.stack([gx * fun, gy * fun, rot * fun, gx * gx, gy * gy, rot * rot,
                    gx * gy, gx * rot, gy * rot])
    s = jax.lax.psum(jnp.sum(P9, axis=1), axis)
    dtr = s[:3]
    H = jnp.array([[s[3], s[6], s[7]], [s[6], s[4], s[8]], [s[7], s[8], s[5]]])
    return H, dtr


def tiled_gn_iteration_local(local, width, rows, points, valid, pose_px,
                             scale_to_map, axis, deriv_clamp=0.2):
    H, dtr = tiled_hessian_derivs_local(local, width, rows, points, valid,
                                        pose_px, scale_to_map, axis)
    return pose_px + gn.solve_gn_step(H, dtr, deriv_clamp)


def tiled_occupancy_update_local(local: jnp.ndarray, width: int, rows: int,
                                 points: jnp.ndarray, valid: jnp.ndarray,
                                 robot_pose_world: jnp.ndarray,
                                 scan_pose: jnp.ndarray, scale_to_map: float,
                                 log_odds_free: float, log_odds_occupied: float,
                                 axis: str,
                                 occupied_cap: float = 50.0) -> jnp.ndarray:
    """Tile-local slice of ops.logodds.update_occupancy + halo refresh.

    Rasterization is replicated; each device scatters only cells in its rows.
    Rays crossing tile borders need no decomposition — every device walks every
    beam and keeps its own cells (SURVEY.md §7 hard-part 3 resolved by replicated
    geometry).
    """
    tile = jax.lax.axis_index(axis)
    r0 = tile * rows
    height = rows * jax.lax.axis_size(axis)

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
    ok2 = lambda p: ((p[..., 0] >= 0) & (p[..., 0] < width) &
                     (p[..., 1] >= 0) & (p[..., 1] < height))
    beam_ok = valid & ~same & ok2(begin_b) & ok2(end)

    cells = hector_line_cells(begin_b, end, width, max_steps=height)
    cy = cells.flat // width
    cx = cells.flat - cy * width
    fmask = cells.mask & beam_ok[:, None] & (cy >= r0) & (cy < r0 + rows)
    lflat = jnp.where(fmask, (cy - r0) * width + cx, 0)

    ncells = rows * width
    free = jnp.zeros(ncells, jnp.int32).at[lflat.reshape(-1)].max(
        fmask.reshape(-1).astype(jnp.int32))
    omask = beam_ok & (end[:, 1] >= r0) & (end[:, 1] < r0 + rows)
    oflat = jnp.where(omask, (end[:, 1] - r0) * width + end[:, 0], 0)
    occ = jnp.zeros(ncells, jnp.int32).at[oflat].max(omask.astype(jnp.int32))

    owned = local[:rows].reshape(-1)
    is_occ = occ > 0
    is_free = (free > 0) & ~is_occ
    owned = (owned + jnp.where(is_free, log_odds_free, 0.0)
             + jnp.where(is_occ & (owned < occupied_cap), log_odds_occupied,
                         0.0))
    new_local = local.at[:rows].set(owned.reshape(rows, width))
    return halo_exchange_local(new_local, axis)


# ------------------------- host-side wrappers -------------------------------

def shard_grid(mesh: Mesh, grid: jnp.ndarray, axis: str = "tile"):
    """Split a global [H, W] grid into per-tile [rows+1, W] locals (with halos),
    stacked on a leading tile axis and sharded over `axis`."""
    n = mesh.shape[axis]
    h, w = grid.shape
    assert h % n == 0
    rows = h // n
    tiles = []
    for t in range(n):
        owned = grid[t * rows:(t + 1) * rows]
        halo = grid[(t + 1) * rows] if t + 1 < n else jnp.zeros(w, grid.dtype)
        tiles.append(jnp.concatenate([owned, halo[None]], axis=0))
    stacked = jnp.stack(tiles)
    return jax.device_put(
        stacked, jax.sharding.NamedSharding(mesh, P(axis)))


def unshard_grid(stacked: jnp.ndarray) -> jnp.ndarray:
    """Reassemble the global grid from stacked [T, rows+1, W] locals."""
    return jnp.concatenate([t[:-1] for t in stacked], axis=0)
