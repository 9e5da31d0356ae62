"""Sharded CoreSLAM == dense CoreSLAM, BIT-EXACT (VERDICT round-1 missing #2).

Unlike the Hector matcher (float psum ordering), every sharded CoreSLAM
reduction is an integer add or a lexicographic argmin, so the whole pipeline —
pose track, hole map, obstacle map — must match the dense models/coreslam
exactly on the 8-device CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slamnet_tpu.core import CoreSlamConfig, SimConfig
from slamnet_tpu.core.scan import Scan
from slamnet_tpu.models import coreslam, coreslam_sharded
from slamnet_tpu.parallel import make_mesh
from slamnet_tpu.sim import default_field, lidar
from slamnet_tpu.sim.trajectory import loop_trajectory

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")

CFG = CoreSlamConfig(num_candidates=1024)


def _scan_log(n_scans):
    sim = SimConfig()
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
    return np.asarray(traj), pts, valids


def test_sharded_pipeline_bit_exact_vs_dense():
    n = 40
    traj, pts, valids = _scan_log(n)
    mesh = make_mesh({"tile": 4, "search": 2})

    dense = coreslam.init(CFG, traj[0], key=jax.random.PRNGKey(7))
    sh = coreslam_sharded.shard_state(mesh, dense, CFG)
    step = coreslam_sharded.make_step(mesh, CFG)

    @jax.jit
    def dense_step(st, p, v):
        return coreslam.update_cloud(st, Scan(p, v, jnp.zeros(3, jnp.float32)),
                                     st.pose, CFG)

    for t in range(n):
        dense, dinfo = dense_step(dense, pts[t], valids[t])
        sh, sinfo = step(sh, pts[t], valids[t], sh.pose)
        np.testing.assert_array_equal(np.asarray(sh.pose),
                                      np.asarray(dense.pose))
        assert int(sinfo.best_sum) == int(dinfo.best_sum)

    back = coreslam_sharded.to_dense(sh)
    np.testing.assert_array_equal(np.asarray(back.hole_map),
                                  np.asarray(dense.hole_map))
    np.testing.assert_array_equal(np.asarray(back.obstacle_map),
                                  np.asarray(dense.obstacle_map))
    assert int(back.scan_count) == int(dense.scan_count)

    # and it actually tracked the trajectory
    err = np.linalg.norm(np.asarray(sh.pose[:2]) - traj[-1][:2])
    assert err < 0.5, err


def test_sharded_production_mode_bit_exact_vs_dense():
    # the PRODUCTION config (bench.py): correlative search + dense polar
    # fills.  Theta bins shard over 'search', the count-grid x shifted-plane
    # contraction shards over 'tile', the dense fills are elementwise per
    # owned row — everything integer-exact, so the replay must stay BIT-EXACT
    # vs the dense pipeline (VERDICT round-2 task 2).
    import dataclasses
    cfg = dataclasses.replace(CoreSlamConfig(), search_mode="correlative",
                              dense_hole_fill=True, dense_obstacle_fill=True)
    n = 40
    traj, pts, valids = _scan_log(n)
    mesh = make_mesh({"tile": 4, "search": 2})

    dense = coreslam.init(cfg, traj[0], key=jax.random.PRNGKey(7))
    sh = coreslam_sharded.shard_state(mesh, dense, cfg)
    step = coreslam_sharded.make_step(mesh, cfg)

    @jax.jit
    def dense_step(st, p, v):
        return coreslam.update_cloud(st, Scan(p, v, jnp.zeros(3, jnp.float32)),
                                     st.pose, cfg)

    for t in range(n):
        dense, dinfo = dense_step(dense, pts[t], valids[t])
        sh, sinfo = step(sh, pts[t], valids[t], sh.pose)
        np.testing.assert_array_equal(np.asarray(sh.pose),
                                      np.asarray(dense.pose))
        assert int(sinfo.best_sum) == int(dinfo.best_sum)

    back = coreslam_sharded.to_dense(sh)
    np.testing.assert_array_equal(np.asarray(back.hole_map),
                                  np.asarray(dense.hole_map))
    np.testing.assert_array_equal(np.asarray(back.obstacle_map),
                                  np.asarray(dense.obstacle_map))
    err = np.linalg.norm(np.asarray(sh.pose[:2]) - traj[-1][:2])
    assert err < 0.5, err


def test_shard_roundtrip():
    mesh = make_mesh({"tile": 4, "search": 2})
    dense = coreslam.init(CFG, (20.0, 20.0, 0.0))
    rng = np.random.default_rng(0)
    dense = dense._replace(hole_map=jnp.asarray(
        rng.integers(0, 65500, CFG.hole_map_size ** 2), jnp.int32))
    sh = coreslam_sharded.shard_state(mesh, dense, CFG)
    back = coreslam_sharded.to_dense(sh)
    np.testing.assert_array_equal(np.asarray(back.hole_map),
                                  np.asarray(dense.hole_map))
