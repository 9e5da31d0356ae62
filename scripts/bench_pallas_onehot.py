#!/usr/bin/env python
"""Pallas one-hot matcher vs the XLA matchers on the real chip (round 4).

Match-only 512-scan replays with a LOOP-VARIANT map table (the honest
condition, docs/PERF.md), then the full pipeline (match + gated dense fills)
with matcher_mode="pallas" vs the current headline mode.

Run on the real TPU:  python scripts/bench_pallas_onehot.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import jax.numpy as jnp
import numpy as np

from slamnet_tpu.core import HectorConfig, SimConfig
from slamnet_tpu.core.scan import Scan
from slamnet_tpu.models import hector
from slamnet_tpu.sim import default_field, lidar
from slamnet_tpu.sim.trajectory import loop_trajectory


def main():
    base = HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4))
    sim = SimConfig()
    n_scans, boot = 512, 10
    fld = default_field()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))
    traj = loop_trajectory(speed=0.3)[: n_scans + boot]

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

    state = hector.init(base, traj[0])
    for t in range(boot):
        state, _ = hector.update(
            state, Scan(pts[t], valids[t], jnp.zeros(3)),
            jnp.asarray(traj[t]), base, map_without_matching=jnp.asarray(True))
        state = state._replace(match_pose=jnp.asarray(traj[t], jnp.float32))
    jax.block_until_ready(state)

    # ---- match-only replays, loop-variant table ---------------------------
    def make_match_replay(cfg_x):
        @jax.jit
        def replay(maps, pose0, radii, valids):
            def body(carry, inp):
                maps, pose = carry
                r, v = inp
                p = jnp.stack([r * jnp.cos(angles),
                               r * jnp.sin(angles)], -1)
                matched, _ = hector.match_with_stats(
                    maps, Scan(p, v, jnp.zeros(3)), pose, cfg_x)
                maps = maps.at[0].add(1e-6)        # loop-variant operand
                return (maps, matched), matched
            (maps, pose), out = jax.lax.scan(body, (maps, pose0),
                                             (radii, valids))
            return pose, out
        return replay

    def measure(fn, label):
        try:
            pose, out = fn(state.maps, state.match_pose,
                           radii[boot:], valids[boot:])
            jax.block_until_ready(pose)
        except Exception as e:
            print(f"{label}: FAILED: {type(e).__name__}: {str(e)[:400]}")
            return None
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            pose, out = fn(state.maps, state.match_pose,
                           radii[boot:], valids[boot:])
            jax.block_until_ready(pose)
            best = min(best, time.time() - t0)
        per = best / n_scans * 1e6
        print(f"{label}: {per:8.1f} us/match  final pose "
              f"{np.round(np.asarray(pose), 4)}")
        return np.asarray(out)

    outs = {}
    for name, cfg_x in (
            ("gather", base),
            ("onehot_bf16", dataclasses.replace(base,
                                                matcher_mode="onehot_bf16")),
            ("pallas", dataclasses.replace(base, matcher_mode="pallas"))):
        outs[name] = measure(make_match_replay(cfg_x), f"match {name:12s}")
    if outs.get("pallas") is not None and outs.get("onehot_bf16") is not None:
        d = np.abs(outs["pallas"] - outs["onehot_bf16"]).max()
        print(f"pallas vs onehot_bf16 max pose diff over replay: {d:.5f}")

    # ---- full pipeline (match + gated dense fill + bookkeeping) -----------
    def make_full_replay(cfg_x):
        @jax.jit
        def replay(state, radii, valids):
            def body(st, inp):
                r, v = inp
                p = jnp.stack([r * jnp.cos(angles),
                               r * jnp.sin(angles)], -1)
                st, _ = hector.update(st, Scan(p, v, jnp.zeros(3)),
                                      st.match_pose, cfg_x,
                                      map_without_matching=jnp.asarray(False))
                return st, st.match_pose
            return jax.lax.scan(body, state, (radii, valids))
        return replay

    for name, cfg_x in (
            ("onehot_bf16_dense (headline)",
             dataclasses.replace(base, matcher_mode="onehot_bf16",
                                 dense_free_fill=True, early_exit_tol=1e-3)),
            ("pallas_dense",
             dataclasses.replace(base, matcher_mode="pallas",
                                 dense_free_fill=True))):
        fn = make_full_replay(cfg_x)
        try:
            stf, poses = fn(state, radii[boot:], valids[boot:])
            jax.block_until_ready(stf)
        except Exception as e:
            print(f"full {name}: FAILED: {type(e).__name__}: {str(e)[:400]}")
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            stf, poses = fn(state, radii[boot:], valids[boot:])
            jax.block_until_ready(stf)
            best = min(best, time.time() - t0)
        err = np.asarray(poses) - traj[boot:]
        pe = np.linalg.norm(err[:, :2], axis=1)
        print(f"full {name}: {n_scans / best:8.1f} scans/s  "
              f"ate {np.sqrt((pe ** 2).mean()):.4f} max {pe.max():.4f}")


if __name__ == "__main__":
    main()
