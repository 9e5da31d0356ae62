"""Fleet serving: many independent SLAM instances batched on one chip.

The production deployment mode with no reference counterpart: a server-side chip
tracks B robots at once by vmapping the full per-scan update over a batched state
pytree.  Each instance has its own maps/pose/RNG; the batch dimension rides the
VPU/MXU for free — per-chip throughput scales with B until memory or compute
saturates (a 3-level 400x400 Hector instance is ~1 MB of maps, so hundreds of
instances fit in HBM).

Note: under vmap, the per-instance map-update gate (lax.cond) lowers to select —
every instance pays the scatter every scan.  That is the right trade for fleet
throughput (uniform work, no divergence); latency-critical single streams should
use the unbatched models.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import HectorConfig
from ..core.scan import Scan
from . import hector


def init_fleet(cfg: HectorConfig, start_poses) -> hector.HectorState:
    """Batched HectorState for B instances; start_poses f32[B, 3]."""
    start_poses = jnp.asarray(start_poses, jnp.float32)

    def one(p):
        return hector.init(cfg, p)

    return jax.vmap(one)(start_poses)


def update_fleet(states: hector.HectorState, points, valid, cfg: HectorConfig,
                 map_without_matching=False) -> Tuple[hector.HectorState,
                                                      hector.HectorInfo]:
    """One scan step for every instance; points f32[B, N, 2], valid bool[B, N]."""
    force = jnp.broadcast_to(jnp.asarray(map_without_matching),
                             (points.shape[0],))

    def one(st, pts, v, f):
        cloud = Scan(pts, v, jnp.zeros(3, jnp.float32))
        return hector.update(st, cloud, st.match_pose, cfg,
                             map_without_matching=f)

    return jax.vmap(one)(states, points, valid, force)


def replay_fleet(states: hector.HectorState, radii, valids, angles,
                 cfg: HectorConfig):
    """On-device replay over T scans for all B instances: radii f32[T, B, N].

    Returns (final states, match poses f32[T, B, 3]).
    """
    def body(sts, inp):
        r, v = inp
        pts = jnp.stack([r * jnp.cos(angles)[None, :],
                         r * jnp.sin(angles)[None, :]], -1)
        sts, info = update_fleet(sts, pts, v, cfg)
        return sts, sts.match_pose

    return jax.lax.scan(body, states, (radii, valids))
