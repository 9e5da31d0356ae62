#!/usr/bin/env python
"""Isolate the 'maps loop-variance' cost in the Hector replay.

  m1: match-only, maps threaded unchanged (XLA can treat the table invariant)
  m2: match-only + dummy data-dependent 1-element write to maps
  m3: match-only + full maps copy (maps + 0.0 * data)
  m4: full hector.update with gate thresholds at +inf (cond never fires)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import time
import numpy as np
import jax
import jax.numpy as jnp

from slamnet_tpu.core import HectorConfig, SimConfig
from slamnet_tpu.core.scan import Scan
from slamnet_tpu.models import hector
from slamnet_tpu.sim import default_field, lidar
from slamnet_tpu.sim.trajectory import loop_trajectory

cfg = HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4))
sim = SimConfig()
n_scans = 512
bootstrap = 10

cpu = jax.devices("cpu")[0]
fld = default_field()
angles_np = lidar.revolution_angles(sim.num_scan_points)
traj = loop_trajectory(speed=0.3)[: n_scans + bootstrap]

with jax.default_device(cpu):
    fld_c = jax.tree.map(lambda x: jax.device_put(x, cpu), fld)
    angles_c = jax.device_put(jnp.asarray(angles_np), cpu)

    @jax.jit
    def genlog(poses, key):
        keys = jax.random.split(key, poses.shape[0])
        def one(p, k):
            return lidar.scan_revolution(fld_c, p, angles_c, sim.max_scan_dist,
                                         sim.measure_error, k)
        return jax.vmap(one)(poses, keys)

    radii_c, valids_c = genlog(jax.device_put(jnp.asarray(traj), cpu),
                               jax.device_put(jax.random.PRNGKey(0), cpu))

dev = jax.devices()[0]
radii = jax.device_put(np.asarray(radii_c), dev)
valids = jax.device_put(np.asarray(valids_c), dev)
angles = jax.device_put(jnp.asarray(angles_np), dev)
traj_d = jax.device_put(jnp.asarray(traj), dev)


def make_cloud(r, v):
    pts = jnp.stack([r * jnp.cos(angles), r * jnp.sin(angles)], -1)
    return Scan(pts, v, jnp.zeros(3, jnp.float32))


@jax.jit
def boot(state, radii, valids, poses):
    def body(st, inp):
        r, v, p = inp
        st, _ = hector.update(st, make_cloud(r, v), p, cfg,
                              map_without_matching=jnp.asarray(True))
        return st, None
    st, _ = jax.lax.scan(body, state, (radii, valids, poses))
    return st


state = hector.init(cfg, traj[0])
state = boot(state, radii[:bootstrap], valids[:bootstrap], traj_d[:bootstrap])
jax.block_until_ready(state)


def timed(name, replay):
    out = replay(state, radii[bootstrap:], valids[bootstrap:])
    jax.block_until_ready(out[0])
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        out = replay(state, radii[bootstrap:], valids[bootstrap:])
        jax.block_until_ready(out[0])
        best = min(best, time.time() - t0)
    print(f"{name:28s}: {best/n_scans*1e6:7.1f} us/scan "
          f"({n_scans/best:6.0f} scans/s)", flush=True)


@jax.jit
def m1(state, radii, valids):
    def body(st, inp):
        r, v = inp
        mp = hector.match(st.maps, make_cloud(r, v), st.match_pose, cfg)
        return st._replace(match_pose=mp), mp
    return jax.lax.scan(body, state, (radii, valids))


@jax.jit
def m2(state, radii, valids):
    def body(st, inp):
        r, v = inp
        mp = hector.match(st.maps, make_cloud(r, v), st.match_pose, cfg)
        maps = st.maps.at[0].add(0.0 * r[0])
        return hector.HectorState(maps, mp, st.last_update_pose), mp
    return jax.lax.scan(body, state, (radii, valids))


@jax.jit
def m3(state, radii, valids):
    def body(st, inp):
        r, v = inp
        mp = hector.match(st.maps, make_cloud(r, v), st.match_pose, cfg)
        maps = st.maps + 0.0 * r[0]
        return hector.HectorState(maps, mp, st.last_update_pose), mp
    return jax.lax.scan(body, state, (radii, valids))


cfg_never = dataclasses.replace(cfg, min_distance_diff_for_map_update=1e9,
                                min_angle_diff_for_map_update=1e9)


@jax.jit
def m4(state, radii, valids):
    def body(st, inp):
        r, v = inp
        st, info = hector.update(st, make_cloud(r, v), st.match_pose,
                                 cfg_never,
                                 map_without_matching=jnp.asarray(False))
        return st, st.match_pose
    return jax.lax.scan(body, state, (radii, valids))


timed("m1 match-only invariant", m1)
timed("m2 + dummy 1-elem write", m2)
timed("m3 + full maps copy", m3)
timed("m4 update, gate never", m4)
