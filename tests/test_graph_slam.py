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


def test_rebuild_maps_sharded_equals_serial():
    # north star: keyframe clouds sharded over 'search' (storage split),
    # pyramid rows over 'tile'; result must equal the serial rebuild EXACTLY
    import jax as _jax
    import pytest
    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from slamnet_tpu.models import hector_sharded
    from slamnet_tpu.parallel import make_mesh

    traj = loop_trajectory(speed=0.3)[:300]
    state, infos, hcfg, gcfg = _run(traj)
    serial = graph_slam.rebuild_maps(state, hcfg)

    mesh = make_mesh({"tile": 4, "search": 2})
    stacked = graph_slam.rebuild_maps_sharded(mesh, state, hcfg)
    sh = hector_sharded.ShardedHectorState(
        local_maps=stacked, match_pose=jnp.zeros(3),
        last_update_pose=jnp.zeros(3))
    np.testing.assert_array_equal(
        np.asarray(hector_sharded.unshard_maps(sh, hcfg)),
        np.asarray(serial))


def test_capacity_guard_no_corrupt_edges():
    # graph fills up mid-run: further keyframes must become no-ops, never
    # edges wired to a clamped node index (the round-1 silent-overflow bug)
    traj = loop_trajectory(speed=0.3)[:300]
    gcfg = PoseGraphConfig(max_keyframes=3, max_edges=256, keyframe_dist=1.0,
                           keyframe_angle=0.6)
    state, infos, hcfg, _ = _run(traj, gcfg=gcfg)
    g = state.graph
    assert int(g.num_nodes) == 3
    ne = int(g.num_edges)
    ei = np.asarray(g.edge_i[:ne])
    ej = np.asarray(g.edge_j[:ne])
    # every stored edge references a DISTINCT pair of valid nodes
    assert (ei < 3).all() and (ej < 3).all()
    assert (ei != ej).all()
    # the odometry chain stops growing once full: at most 2 chain edges
    # (0->1, 1->2) plus any accepted loop edges between valid nodes
    chain = [(int(a), int(b)) for a, b in zip(ei, ej)]
    assert chain.count((0, 1)) == 1 and chain.count((1, 2)) == 1


def test_false_loop_rejected():
    # perceptual aliasing: the stored candidate clouds are garbage, so the
    # return pass must REJECT every loop-closure attempt
    fwd = np.stack([np.linspace(20, 23.5, 30), np.full(30, 20.0),
                    np.zeros(30)], -1).astype(np.float32)
    back = fwd[::-1].copy()
    still = np.tile(np.asarray([20.0, 20.0, 0.0], np.float32), (12, 1))
    traj = np.concatenate([still, fwd, back])
    gcfg = PoseGraphConfig(max_keyframes=64, max_edges=256, keyframe_dist=0.8,
                           keyframe_angle=0.6, loop_closure_radius=1.5)

    hcfg = HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4))
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

    half = len(still) + len(fwd)
    for t in range(half):
        key, sub = jax.random.split(key)
        state, _ = step(state, jnp.asarray(traj[t]), sub, jnp.asarray(t < 10))

    # corrupt every stored keyframe cloud (a different, unrelated place)
    rng = np.random.default_rng(7)
    garbage = rng.uniform(-12.0, 12.0,
                          state.kf_points.shape).astype(np.float32)
    state = state._replace(kf_points=jnp.asarray(garbage))

    for t in range(half, len(traj)):
        key, sub = jax.random.split(key)
        state, _ = step(state, jnp.asarray(traj[t]), sub, jnp.asarray(False))

    # no aliased loop accepted, and the live track stayed on the trajectory
    assert int(state.loop_count) == 0
    err = np.linalg.norm(
        np.asarray(state.hector.match_pose[:2]) - traj[-1][:2])
    assert err < 0.5, err


def _revisit_traj():
    fwd = np.stack([np.linspace(20, 23.5, 30), np.full(30, 20.0),
                    np.zeros(30)], -1).astype(np.float32)
    back = fwd[::-1].copy()
    still = np.tile(np.asarray([20.0, 20.0, 0.0], np.float32), (12, 1))
    return np.concatenate([still, fwd, back])


def _pregen_scans(traj):
    sim = SimConfig()
    fld = default_field()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))

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
    return pts, valids


def test_sharded_graph_slam_matches_dense():
    # the north-star composition (VERDICT round-2 task 1): sharded Hector
    # matching + sharded keyframe storage + loop closure + node-sharded Schur
    # GN, as ONE SPMD step, replayed over a revisit trajectory — must accept
    # >= 1 loop closure and track the dense graph_slam to float tolerance
    import jax as _jax
    import pytest
    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from slamnet_tpu.models import graph_slam_sharded
    from slamnet_tpu.parallel import make_mesh

    traj = _revisit_traj()
    pts, valids = _pregen_scans(traj)
    hcfg = HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4))
    gcfg = PoseGraphConfig(max_keyframes=64, max_edges=256, keyframe_dist=0.8,
                           keyframe_angle=0.6, loop_closure_radius=1.5)
    n = pts.shape[1]

    dense = graph_slam.init(hcfg, gcfg, traj[0], n)

    @jax.jit
    def dense_step(state, p, v, boot):
        cloud = Scan(p, v, jnp.zeros(3, jnp.float32))
        return graph_slam.update(state, cloud, hcfg, gcfg,
                                 map_without_matching=boot)

    mesh = make_mesh({"tile": 2, "search": 4})
    sh = graph_slam_sharded.init(mesh, hcfg, gcfg, traj[0], n)
    step = graph_slam_sharded.make_step(mesh, hcfg, gcfg, n)

    d_poses, s_poses = [], []
    overflow_max = 0
    for t in range(traj.shape[0]):
        boot = jnp.asarray(t < 10)
        dense, dinfo = dense_step(dense, pts[t], valids[t], boot)
        sh, sinfo = step(sh, pts[t], valids[t], boot)
        d_poses.append(np.asarray(dense.hector.match_pose))
        s_poses.append(np.asarray(sh.match_pose))
        overflow_max = max(overflow_max, int(sinfo.sep_overflow))

    assert overflow_max == 0
    assert int(dense.loop_count) >= 1
    assert int(sh.loop_count) >= 1
    assert int(sh.graph.num_nodes) == int(dense.graph.num_nodes)
    assert int(sh.graph.num_edges) == int(dense.graph.num_edges)

    nkf = int(dense.graph.num_nodes)
    np.testing.assert_allclose(np.asarray(sh.graph.poses[:nkf]),
                               np.asarray(dense.graph.poses[:nkf]),
                               rtol=0, atol=2e-2)
    np.testing.assert_allclose(np.asarray(s_poses), np.asarray(d_poses),
                               rtol=0, atol=2e-2)
    # sharded keyframe cloud storage reassembles to the dense storage
    np.testing.assert_allclose(np.asarray(sh.kf_points),
                               np.asarray(dense.kf_points), rtol=0, atol=0)


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
