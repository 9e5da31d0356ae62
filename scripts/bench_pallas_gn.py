#!/usr/bin/env python
"""Measure the Pallas full-matcher kernel vs the XLA fused matcher on the
chip (VERDICT r02 task 3: "one honest Pallas attempt at the matcher gather
wall — or a measured retirement").

Both run the identical 3-level 7/4/4 match over a 512-scan on-device replay
with a LOOP-VARIANT map table (docs/PERF.md: the tunneled runtime memoizes
identical calls, and a loop-invariant table lets XLA hoist operand prep —
replay-scale with varying inputs is the only honest timing).

Run on the real TPU:  python scripts/bench_pallas_gn.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from slamnet_tpu.core import HectorConfig, SimConfig
from slamnet_tpu.core.scan import Scan
from slamnet_tpu.models import hector
from slamnet_tpu.ops import pallas_gn
from slamnet_tpu.sim import default_field, lidar
from slamnet_tpu.sim.trajectory import loop_trajectory


def main():
    cfg = HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4))
    sim = SimConfig()
    n_scans = 256
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

    # warm a map
    state = hector.init(cfg, traj[0])
    for t in range(10):
        state, _ = hector.update(
            state, Scan(pts[t], valids[t], jnp.zeros(3)),
            jnp.asarray(traj[t]), cfg, map_without_matching=jnp.asarray(True))
        state = state._replace(match_pose=jnp.asarray(traj[t], jnp.float32))
    jax.block_until_ready(state)

    n = pts.shape[1]
    pad = -(-n // 128) * 128
    zpad = jnp.zeros(pad - n)

    # XLA fused matcher replay (match only, loop-variant table via tiny nudge)
    @jax.jit
    def xla_replay(maps, pose0, radii, valids):
        def body(carry, inp):
            maps, pose = carry
            r, v = inp
            p = jnp.stack([r * jnp.cos(angles), r * jnp.sin(angles)], -1)
            matched, _ = hector.match_with_stats(
                maps, Scan(p, v, jnp.zeros(3)), pose, cfg)
            maps = maps.at[0].add(1e-6)        # loop-variant operand
            return (maps, matched), matched
        (maps, pose), out = jax.lax.scan(body, (maps, pose0), (radii, valids))
        return pose, out

    @jax.jit
    def pallas_replay(maps, pose0, radii, valids):
        def body(carry, inp):
            maps, pose = carry
            r, v = inp
            X = jnp.concatenate([r * jnp.cos(angles), zpad])
            Y = jnp.concatenate([r * jnp.sin(angles), zpad])
            V = jnp.concatenate([v, jnp.zeros(pad - n, bool)])
            matched = pallas_gn.match_pallas(maps, cfg, pose, X, Y, V)
            maps = maps.at[0].add(1e-6)
            return (maps, matched), matched
        (maps, pose), out = jax.lax.scan(body, (maps, pose0), (radii, valids))
        return pose, out

    def measure(fn, label):
        try:
            pose, out = fn(state.maps, state.match_pose, radii[10:],
                           valids[10:])
            jax.block_until_ready(pose)
        except Exception as e:  # compile failure IS a result — report it
            print(f"{label}: FAILED to compile/run: {type(e).__name__}: "
                  f"{str(e)[:300]}")
            return None, None
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            pose, out = fn(state.maps, state.match_pose, radii[10:],
                           valids[10:])
            jax.block_until_ready(pose)
            best = min(best, time.time() - t0)
        per_match = best / (n_scans - 10) * 1e6
        print(f"{label}: {per_match:8.1f} us/match (15 GN iterations)  "
              f"final pose {np.round(np.asarray(pose), 4)}")
        return per_match, np.asarray(out)

    import dataclasses

    def make_mode_replay(cfg_x):
        @jax.jit
        def replay(maps, pose0, radii, valids):
            def body(carry, inp):
                maps, pose = carry
                r, v = inp
                p = jnp.stack([r * jnp.cos(angles), r * jnp.sin(angles)], -1)
                matched, _ = hector.match_with_stats(
                    maps, Scan(p, v, jnp.zeros(3)), pose, cfg_x)
                maps = maps.at[0].add(1e-6)
                return (maps, matched), matched
            (maps, pose), out = jax.lax.scan(body, (maps, pose0),
                                             (radii, valids))
            return pose, out
        return replay

    print(f"device: {jax.devices()[0]}")
    t_x, p_x = measure(xla_replay, "XLA gather matcher    ")
    t_oh, p_oh = measure(
        make_mode_replay(dataclasses.replace(cfg,
                                             matcher_mode="onehot_highest")),
        "one-hot MXU (highest) ")
    t_ob, p_ob = measure(
        make_mode_replay(dataclasses.replace(cfg, matcher_mode="onehot_bf16")),
        "one-hot MXU (bf16)    ")
    t_p, p_p = measure(pallas_replay, "Pallas VMEM matcher   ")
    if t_x and t_p:
        print(f"ratio pallas/xla: {t_p / t_x:.1f}x")
    if t_x and t_oh and p_oh is not None:
        print(f"ratio onehot_highest/xla: {t_oh / t_x:.2f}x  "
              f"max pose diff {float(np.abs(p_x - p_oh).max()):.2e}")
    if t_x and t_ob and p_ob is not None:
        print(f"ratio onehot_bf16/xla: {t_ob / t_x:.2f}x  "
              f"max pose diff {float(np.abs(p_x - p_ob).max()):.2e}")


if __name__ == "__main__":
    main()
