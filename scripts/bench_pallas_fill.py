#!/usr/bin/env python
"""Measure the deployable Pallas dense polar fill vs its XLA twins on the
chip — the source of the docs/PERF.md "Pallas dense polar fill" table
(cited by ops/pallas_fill.py).

Three implementations of one 400x400 occupancy update, loop-variant operand,
on-device lax.scan replay (docs/PERF.md measurement rules):
  1. pallas  — ops/pallas_fill.update_occupancy_dense_pallas (Mosaic kernel)
  2. dense   — ops/logodds.update_occupancy_dense (XLA atan2 + table gather)
  3. line    — ops/logodds.update_occupancy (reference-parity line scatter)

Run on the real TPU:  python scripts/bench_pallas_fill.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from slamnet_tpu.core import HectorConfig, SimConfig
from slamnet_tpu.ops import logodds, pallas_fill
from slamnet_tpu.sim import default_field, lidar
from slamnet_tpu.sim.trajectory import loop_trajectory


def main():
    cfg = HectorConfig(num_levels=1, estimate_iterations=(7,))
    sim = SimConfig()
    width = cfg.map_size
    scale = 1.0 / cfg.map_resolution
    n_scans = 128
    fld = default_field()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))
    traj = loop_trajectory(speed=0.3)[:n_scans]

    @jax.jit
    def gen(poses, key):
        keys = jax.random.split(key, poses.shape[0])

        def one(p, k):
            return lidar.scan_revolution(fld, p, angles, sim.max_scan_dist,
                                         sim.measure_error, k)
        return jax.vmap(one)(poses, keys)

    radii, valids = gen(jnp.asarray(traj), jax.random.PRNGKey(0))
    pts = jnp.stack([radii * jnp.cos(angles)[None],
                     radii * jnp.sin(angles)[None]], -1)
    poses = jnp.asarray(traj)
    zero3 = jnp.zeros(3, jnp.float32)

    def make_replay(update_fn):
        @jax.jit
        def replay(grid, pts, valids, poses):
            def body(g, inp):
                p, v, pose = inp
                return update_fn(g, p, v, pose), 0
            g, _ = jax.lax.scan(body, grid, (pts, valids, poses))
            return g
        return replay

    impls = {
        "pallas fill (256 bins)": lambda g, p, v, pose:
            pallas_fill.update_occupancy_dense_pallas(
                g, width, p, v, pose, zero3[:2], scale,
                cfg.log_odds_free, cfg.log_odds_occupied, cfg.occupied_cap),
        "XLA dense fill": lambda g, p, v, pose:
            logodds.update_occupancy_dense(
                g, width, p, v, pose, zero3[:2], scale,
                cfg.log_odds_free, cfg.log_odds_occupied, cfg.occupied_cap),
        "XLA line scatter": lambda g, p, v, pose:
            logodds.update_occupancy(
                g, width, p, v, pose, zero3[:2], scale,
                cfg.log_odds_free, cfg.log_odds_occupied, cfg.occupied_cap),
    }

    print(f"device: {jax.devices()[0]}; {n_scans}-scan replay, "
          f"{width}x{width}, update every scan")
    grid0 = jnp.zeros((width * width,), jnp.float32)
    for name, fn in impls.items():
        replay = make_replay(fn)
        try:
            g = replay(grid0, pts, valids, poses)
            jax.block_until_ready(g)
        except Exception as e:
            print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            g = replay(grid0, pts, valids, poses)
            jax.block_until_ready(g)
            best = min(best, time.time() - t0)
        print(f"{name}: {best / n_scans * 1e6:8.0f} us/update   "
              f"(occupied cells: {int((np.asarray(g) > 0).sum())})")


if __name__ == "__main__":
    main()
