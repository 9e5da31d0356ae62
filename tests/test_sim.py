"""Simulator tests: ray caster against brute-force numpy, field geometry, lidar."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from slamnet_tpu.core.scan import segments_to_cloud
from slamnet_tpu.sim import (default_field, lidar, ray_cast, trajectory)


def _numpy_raycast(field, origin, angle, max_dist):
    """Brute-force reference ray/segment intersection."""
    a = np.asarray(field.a)
    b = np.asarray(field.b)
    o = np.asarray(origin, np.float64)
    d = np.array([math.cos(angle), math.sin(angle)])
    best = np.inf
    for i in range(a.shape[0]):
        e = b[i] - a[i]
        m = np.array([[d[0], -e[0]], [d[1], -e[1]]])
        det = np.linalg.det(m)
        if abs(det) < 1e-12:
            continue
        t, u = np.linalg.solve(m, a[i] - o)
        if 0 <= u <= 1 and 0 <= t <= max_dist:
            best = min(best, t)
    return (best < np.inf), (best if best < np.inf else 0.0)


def test_raycast_matches_bruteforce():
    fld = default_field()
    rng = np.random.default_rng(1)
    origins = rng.uniform(6, 34, size=(20, 2)).astype(np.float32)
    angles = rng.uniform(0, 2 * math.pi, size=20).astype(np.float32)
    hit, dist = ray_cast(fld, jnp.asarray(origins[0]), jnp.asarray(angles), 40.0)
    for k in range(20):
        h, d = _numpy_raycast(fld, origins[0], float(angles[k]), 40.0)
        assert bool(hit[k]) == h
        if h:
            np.testing.assert_allclose(float(dist[k]), d, atol=1e-3)


def test_default_field_edge_count():
    # 12-vertex outer loop + 4-vertex inner loop, closed (Field.cs:43-72)
    fld = default_field()
    assert fld.num_edges == 16


def test_start_pose_sees_walls_all_around():
    # From (20,20) inside the field every direction must hit within 40 m.
    fld = default_field()
    angles = jnp.linspace(0.0, 2 * math.pi, 64, endpoint=False)
    hit, dist = ray_cast(fld, jnp.asarray([20.0, 20.0]), angles, 40.0)
    assert bool(jnp.all(hit))
    assert float(jnp.max(dist)) < 40.0
    assert float(jnp.min(dist)) > 1.0


def test_revolution_angles_reference_accumulation():
    angles = lidar.revolution_angles(400)
    # f32 accumulation of 2pi/400 — must cover [0, 2pi) with ~400 entries
    assert 399 <= len(angles) <= 401
    assert angles[0] == 0.0
    assert angles[-1] < 2 * math.pi
    step = np.float32(2 * math.pi / 400)
    np.testing.assert_allclose(np.diff(angles), step, atol=1e-5)


def test_scan_revolution_noise_bounds():
    fld = default_field()
    angles = lidar.revolution_angles(400)
    key = jax.random.PRNGKey(0)
    radii, valid = lidar.scan_revolution(fld, (20.0, 20.0, 0.0), angles, 40.0, 0.02, key)
    assert bool(jnp.all(valid))  # all rays hit from the center
    # noise is within +/-0.02 of the true distance
    _, true_dist = ray_cast(fld, jnp.asarray([20.0, 20.0]),
                            jnp.asarray(angles), 40.0)
    err = np.abs(np.asarray(radii) - np.asarray(true_dist))
    assert err.max() <= 0.02 + 1e-6


def test_segments_to_cloud_deskew():
    # Segment captured at a pose offset from odometry: cloud points shift by the
    # relative pose (component-wise, CoreSLAMProcessor.cs:187-207).
    angles = np.array([0.0, math.pi / 2], np.float32)
    radii = np.array([1.0, 2.0], np.float32)
    seg = lidar.make_segment_scan(angles, radii, np.array([True, True]),
                                  np.array([1.0, 2.0, 0.0], np.float32))
    cloud = segments_to_cloud(seg)
    # single segment: pose == odometry -> rel pose zero -> pure polar->cartesian
    np.testing.assert_allclose(np.asarray(cloud.points), [[1.0, 0.0], [0.0, 2.0]],
                               atol=1e-6)


def test_loop_trajectory_within_envelope():
    poses = trajectory.loop_trajectory(speed=0.3, scan_rate=17.0)
    assert poses.shape[0] > 1000
    step = np.linalg.norm(np.diff(poses[:, :2], axis=0), axis=1)
    assert step.max() < 0.05  # << 2.5 m/scan Hector envelope (README.md:35-39)
    dth = np.abs(np.diff(np.unwrap(poses[:, 2].astype(np.float64))))
    assert dth.max() < math.radians(20.0)  # angular envelope (README.md:40)


def test_rect_revisit_trajectory_turns_and_revisits():
    """The graph-bench trajectory (round 4): heading changes at every corner
    AND periodic revisits of the start corner — both inside the envelope."""
    poses = trajectory.rect_revisit_trajectory(num_loops=2)
    assert poses.shape[0] >= 500
    step = np.linalg.norm(np.diff(poses[:, :2], axis=0), axis=1)
    assert step.max() < 0.4        # < coarsest-level pixel (README.md:35-39)
    th = np.unwrap(poses[:, 2].astype(np.float64))
    dth = np.abs(np.diff(th))
    assert dth.max() < math.radians(20.0)
    # real rotation happens: two CCW laps accumulate ~4pi of heading
    assert th.max() - th.min() > 1.5 * math.pi
    # the second lap re-approaches the start corner (loop-closure radius 2.0)
    start = poses[0, :2]
    d = np.linalg.norm(poses[:, :2] - start[None], axis=1)
    away = np.where(d > 3.0)[0]
    assert away.size > 0
    assert d[away[0]:].min() < 0.5  # returns to within 0.5 m after leaving
