"""Graph-SLAM composition: keyframes spawn, loops close, rebuilt maps are clean."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from slamnet_tpu.core import HectorConfig, PoseGraphConfig, SimConfig
from slamnet_tpu.core.scan import Scan
from slamnet_tpu.models import graph_slam, hector
from slamnet_tpu.sim import default_field, lidar
from slamnet_tpu.sim.trajectory import loop_trajectory


def _run(traj, hcfg=None, gcfg=None):
    hcfg = hcfg or HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4))
    gcfg = gcfg or PoseGraphConfig(max_keyframes=64, max_edges=256,
                                   keyframe_dist=1.0, keyframe_angle=0.6)
    sim = SimConfig()
    fld = default_field()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))
    n = len(angles)
    key = jax.random.PRNGKey(0)
    state = graph_slam.init(hcfg, gcfg, traj[0], n)

    @jax.jit
    def step(state, real_pose, key, boot):
        radii, valid = lidar.scan_revolution(fld, real_pose, angles,
                                             sim.max_scan_dist,
                                             sim.measure_error, key)
        pts = jnp.stack([radii * jnp.cos(angles), radii * jnp.sin(angles)], -1)
        cloud = Scan(pts, valid, jnp.zeros(3, jnp.float32))
        return graph_slam.update(state, cloud, hcfg, gcfg,
                                 map_without_matching=boot)

    infos = []
    for t in range(traj.shape[0]):
        key, sub = jax.random.split(key)
        state, info = step(state, jnp.asarray(traj[t]), sub,
                           jnp.asarray(t < 10))
        infos.append(info)
    return state, infos, hcfg, gcfg


def test_keyframes_spawn_and_track():
    traj = loop_trajectory(speed=0.3)[:300]
    state, infos, hcfg, gcfg = _run(traj)
    nkf = int(state.graph.num_nodes)
    # ~5 m of travel at 1 m keyframe spacing (+ the initial node)
    assert 4 <= nkf <= 12, nkf
    kf = sum(int(i.keyframe_added) for i in infos)
    assert kf == nkf - 1
    # optimized keyframe poses hug the driven trajectory
    poses = np.asarray(state.graph.poses[:nkf])
    dists = [np.min(np.linalg.norm(traj[:, :2] - p[None, :2], axis=1))
             for p in poses]
    assert max(dists) < 0.5, dists


def test_rebuild_maps_produces_clean_pyramid():
    traj = loop_trajectory(speed=0.3)[:300]
    state, infos, hcfg, gcfg = _run(traj)
    rebuilt = graph_slam.rebuild_maps(state, hcfg)
    assert rebuilt.shape == state.hector.maps.shape
    l0 = np.asarray(rebuilt[:hcfg.map_size ** 2])
    assert (l0 > 0).sum() > 300        # occupied walls
    assert (l0 < 0).sum() > 10000      # carved free space


def test_loop_closure_fires_on_revisit():
    # drive out 3 m and come back to the start: the return keyframe is within
    # loop radius of keyframe 0 with an index gap
    fwd = np.stack([np.linspace(20, 23.5, 30), np.full(30, 20.0),
                    np.zeros(30)], -1).astype(np.float32)
    back = fwd[::-1].copy()
    still = np.tile(np.asarray([20.0, 20.0, 0.0], np.float32), (12, 1))
    traj = np.concatenate([still, fwd, back])
    gcfg = PoseGraphConfig(max_keyframes=64, max_edges=256, keyframe_dist=0.8,
                           keyframe_angle=0.6, loop_closure_radius=1.5)
    state, infos, hcfg, _ = _run(traj, gcfg=gcfg)
    assert int(state.loop_count) >= 1
