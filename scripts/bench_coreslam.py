#!/usr/bin/env python
"""CoreSLAM full-pipeline throughput: line-scatter vs dense polar map updates.

On-device lax.scan replay over a simulated loop, same harness as bench.py's
Hector measurement; reports scans/s and final-pose error for each mode.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import time
import numpy as np
import jax
import jax.numpy as jnp

from slamnet_tpu.core import CoreSlamConfig, SimConfig
from slamnet_tpu.core.scan import Scan
from slamnet_tpu.models import coreslam
from slamnet_tpu.sim import default_field, lidar
from slamnet_tpu.sim.trajectory import loop_trajectory

sim = SimConfig()
n_scans = 512

cpu = jax.devices("cpu")[0]
fld = default_field()
angles_np = lidar.revolution_angles(sim.num_scan_points)
traj = loop_trajectory(speed=0.3)[:n_scans]

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


def measure(cfg, label):
    state = coreslam.init(cfg, traj[0], key=jax.random.PRNGKey(1))

    @jax.jit
    def replay(state, radii, valids):
        def body(st, inp):
            r, v = inp
            pts = jnp.stack([r * jnp.cos(angles), r * jnp.sin(angles)], -1)
            cloud = Scan(pts, v, jnp.zeros(3, jnp.float32))
            st, info = coreslam.update_cloud(st, cloud, st.pose, cfg)
            return st, st.pose
        return jax.lax.scan(body, state, (radii, valids))

    stf, poses = replay(state, radii, valids)
    jax.block_until_ready(stf)
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        stf, poses = replay(state, radii, valids)
        jax.block_until_ready(stf)
        best = min(best, time.time() - t0)
    err = np.asarray(poses) - traj
    pe = np.linalg.norm(err[:, :2], axis=1)
    ate = float(np.sqrt((pe ** 2).mean()))
    print(f"{label:28s}: {n_scans/best:7.0f} scans/s  ({best/n_scans*1e6:7.1f}"
          f" us/scan)  ATE {ate:.3f} m  max {pe.max():.3f} m", flush=True)


base = CoreSlamConfig(num_candidates=4096)
dense = dataclasses.replace(base, dense_hole_fill=True,
                            dense_obstacle_fill=True)
measure(dataclasses.replace(dense, search_mode="correlative"),
        "dense + correlative (32x8x8)")
measure(dataclasses.replace(dense, search_mode="correlative",
                            corr_num_theta=16, corr_window=6),
        "dense + correlative (16x6x6)")
measure(dataclasses.replace(dense, num_candidates=1024), "dense + mc1024")
measure(base, "line-scatter (parity, 4096)")
