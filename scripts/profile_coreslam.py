#!/usr/bin/env python
"""Phase breakdown of the CoreSLAM production bench (correlative + dense fills).

Replays 512 scans on device (lax.scan), best-of-5, isolating each phase:
  A. correlative search only (map frozen — loop-variant operand preserved by
     carrying the map through the scan untouched)
  B. dense hole fill only
  C. dense obstacle fill only
  D. full production pipeline (the bench configuration)
  E. full parity pipeline (MC-4096 + line scatters) for contrast
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from slamnet_tpu.core import CoreSlamConfig, SimConfig
from slamnet_tpu.core.scan import Scan
from slamnet_tpu.models import coreslam
from slamnet_tpu.ops import correlate, holemap, obstacle
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

cfg = dataclasses.replace(CoreSlamConfig(), search_mode="correlative",
                          dense_hole_fill=True, dense_obstacle_fill=True)
state0 = coreslam.init(cfg, traj[0], key=jax.random.PRNGKey(1))


def pts_of(r):
    return jnp.stack([r * jnp.cos(angles), r * jnp.sin(angles)], -1)


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1e3:.2f} ms total, {best/n_scans*1e6:.1f} us/scan,"
          f" {n_scans/best:.0f} scans/s", flush=True)
    return out


span = cfg.corr_theta_span or 3.0 * cfg.sigma_theta


@jax.jit
def replay_search(hole, radii, valids):
    def body(h, inp):
        r, v = inp
        pose, s = correlate.correlative_search(
            h, cfg.hole_map_size, cfg.hole_scale, pts_of(r), v,
            jnp.asarray(traj[0], jnp.float32), cfg.corr_window,
            cfg.corr_num_theta, span)
        # keep the map loop-variant exactly like the real pipeline
        h = h.at[0].add(jnp.int32(s) & 0)
        return h, pose
    return jax.lax.scan(body, hole, (radii, valids))


timed("A correlative search only", replay_search, state0.hole_map, radii, valids)


@jax.jit
def replay_hole(hole, radii, valids):
    def body(h, inp):
        r, v = inp
        h = holemap.update_hole_map_dense(
            h, cfg.hole_map_size, cfg.hole_scale, pts_of(r), v,
            jnp.asarray(traj[0], jnp.float32), cfg.hole_width, cfg.quality,
            cfg.angle_bins)
        return h, None
    return jax.lax.scan(body, hole, (radii, valids))


timed("B dense hole fill only", replay_hole, state0.hole_map, radii, valids)


@jax.jit
def replay_obst(om, radii, valids):
    def body(m, inp):
        r, v = inp
        m = obstacle.update_obstacle_map_dense(
            m, cfg.obstacle_map_size, cfg.obstacle_scale, pts_of(r), v,
            jnp.asarray(traj[0], jnp.float32), cfg.max_obstacle_hits,
            cfg.angle_bins)
        return m, None
    return jax.lax.scan(body, om, (radii, valids))


timed("C dense obstacle fill only", replay_obst, state0.obstacle_map, radii,
      valids)


def make_full(cfg_x):
    st0 = coreslam.init(cfg_x, traj[0], key=jax.random.PRNGKey(1))

    @jax.jit
    def replay(state, radii, valids):
        def body(st, inp):
            r, v = inp
            st, _ = coreslam.update_cloud(
                st, Scan(pts_of(r), v, jnp.zeros(3, jnp.float32)), st.pose,
                cfg_x)
            return st, st.pose
        return jax.lax.scan(body, state, (radii, valids))
    return st0, replay


st0, replay = make_full(cfg)
timed("D full production", replay, st0, radii, valids)
