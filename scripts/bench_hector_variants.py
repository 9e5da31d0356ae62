#!/usr/bin/env python
"""Same-process A/B of Hector pipeline variants on the headline workload.

Variants (all 512-scan on-device replays, best of 5):
  cond+line        — bench parity config (gated lax.cond, Bresenham scatter)
  cond+line+EE     — + converged early exit
  cond+dense       — gated cond, dense polygon fill
  select+dense     — unconditional dense update, gate as jnp.where (no cond)
  select+dense+EE  — + early exit
  single-level 7it — BASELINE config 2: one 400x400 level, no pyramid
                     (gather and onehot_bf16 matchers)
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

cfg0 = HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4))
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


def update_select(state, scan, cfg):
    """hector.update with the cond replaced by unconditional compute + select."""
    matched = hector.match(state.maps, scan, state.match_pose, cfg)
    dist2 = jnp.sum((matched[:2] - state.last_update_pose[:2]) ** 2)
    from slamnet_tpu.core.geometry import rad_diff
    ang = jnp.abs(rad_diff(matched[2], state.last_update_pose[2]))
    do_update = ((dist2 > cfg.min_distance_diff_for_map_update ** 2)
                 | (ang > cfg.min_angle_diff_for_map_update))
    new_maps = hector.update_maps(state.maps, scan, matched, cfg)
    maps = jnp.where(do_update, new_maps, state.maps)
    last = jnp.where(do_update, matched, state.last_update_pose)
    return hector.HectorState(maps, matched, last), do_update


import functools


@functools.partial(jax.jit, static_argnums=4)
def boot(state, radii, valids, poses, cfg=None):
    cfg = cfg or cfg0
    def body(st, inp):
        r, v, p = inp
        st, _ = hector.update(st, make_cloud(r, v), p, cfg,
                              map_without_matching=jnp.asarray(True))
        return st, None
    st, _ = jax.lax.scan(body, state, (radii, valids, poses))
    return st


state = hector.init(cfg0, traj[0])
state = boot(state, radii[:bootstrap], valids[:bootstrap], traj_d[:bootstrap])
jax.block_until_ready(state)


def measure(name, cfg, select, state_override=None):
    st_init = state if state_override is None else state_override
    if select:
        @jax.jit
        def replay(state, radii, valids):
            def body(st, inp):
                r, v = inp
                st, upd = update_select(st, make_cloud(r, v), cfg)
                return st, (st.match_pose, upd)
            return jax.lax.scan(body, state, (radii, valids))
    else:
        @jax.jit
        def replay(state, radii, valids):
            def body(st, inp):
                r, v = inp
                st, info = hector.update(st, make_cloud(r, v), st.match_pose,
                                         cfg,
                                         map_without_matching=jnp.asarray(False))
                return st, (st.match_pose, info.map_updated)
            return jax.lax.scan(body, state, (radii, valids))

    stf, (poses, upd) = replay(st_init, radii[bootstrap:], valids[bootstrap:])
    jax.block_until_ready(stf)
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        out = replay(st_init, radii[bootstrap:], valids[bootstrap:])
        jax.block_until_ready(out[0])
        best = min(best, time.time() - t0)
    err = np.asarray(poses) - traj[bootstrap:]
    pe = np.linalg.norm(err[:, :2], axis=1)
    print(f"{name:18s}: {n_scans/best:6.0f} scans/s ({best/n_scans*1e6:7.1f}"
          f" us/scan)  ATE {np.sqrt((pe**2).mean()):.4f} m  max {pe.max():.3f}"
          f"  updates {int(np.asarray(upd).sum())}", flush=True)


ee = dataclasses.replace(cfg0, early_exit_tol=1e-3)
dense = dataclasses.replace(cfg0, dense_free_fill=True)
dense_ee = dataclasses.replace(dense, early_exit_tol=1e-3)

measure("cond+line", cfg0, select=False)
measure("cond+line+EE", ee, select=False)
measure("cond+dense", dense, select=False)
measure("select+dense", dense, select=True)
measure("select+dense+EE", dense_ee, select=True)

# BASELINE config 2: single-level 400x400 GN matcher (no pyramid).  The
# kernel cost is resolution-independent (same pixels/beams/iterations); run
# at the sim's 0.1 m/px so the 40 m field fits the map.  7 GN iterations.
single = HectorConfig(num_levels=1, map_size=400, estimate_iterations=(7,))
sstate = hector.init(single, traj[0])
sstate = boot(sstate, radii[:bootstrap], valids[:bootstrap],
              traj_d[:bootstrap], single)
jax.block_until_ready(sstate)
measure("single-level 7it", single, select=False, state_override=sstate)
measure("single-level 7it onehot_bf16",
        dataclasses.replace(single, matcher_mode="onehot_bf16"), select=False,
        state_override=sstate)
