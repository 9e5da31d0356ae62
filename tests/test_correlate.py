"""Correlative search: exactness vs the reference score + recovery + e2e."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from slamnet_tpu.core import CoreSlamConfig, SimConfig
from slamnet_tpu.core.scan import Scan
from slamnet_tpu.models import coreslam
from slamnet_tpu.ops import correlate, holemap, score
from slamnet_tpu.sim import default_field, lidar
from slamnet_tpu.sim.trajectory import loop_trajectory


def test_score_grid_exact_vs_reference_score():
    """Every (theta, dy, dx) grid entry equals score_candidates at the shifted
    pose — the matmul path is integer-exact (interior points)."""
    size, scale, W, K = 64, 1.6, 8, 5
    rng = np.random.default_rng(0)
    hole = jnp.asarray(rng.integers(0, 65500, size * size), jnp.int32)
    n = 50
    # interior points: snapped coords stay >= W away from every border
    pts = jnp.asarray(rng.uniform(-8.0, 8.0, (n, 2)), jnp.float32)
    valid = jnp.asarray(rng.random(n) > 0.1)
    pose = jnp.asarray([20.0, 20.0, 0.3], jnp.float32)
    thetas = pose[2] + jnp.linspace(-0.3, 0.3, K)

    sums, nb = correlate.correlative_scores(hole, size, scale, pts, valid,
                                            pose, thetas, W)
    sums, nb = np.asarray(sums), np.asarray(nb)

    R = W // 2
    for k in range(K):
        for iy in range(0, W, 3):
            for ix in range(0, W, 3):
                cand = jnp.asarray([pose[0] + (ix - R) / scale,
                                    pose[1] + (iy - R) / scale,
                                    thetas[k]])[None, :]
                s_ref, nb_ref = score.score_candidates(hole, size, scale,
                                                       pts, valid, cand)
                assert int(s_ref[0]) == sums[k, iy, ix], (k, iy, ix)
                assert int(nb_ref[0]) == nb[k, iy, ix], (k, iy, ix)


def test_recovers_known_offset():
    """Build a hole map from a scan at P0, search from a perturbed prior —
    the grid optimum must land back on P0 (within a pixel / theta bin)."""
    cfg = CoreSlamConfig()
    size, scale = cfg.hole_map_size, cfg.hole_scale
    sim = SimConfig()
    fld = default_field()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))
    p0 = jnp.asarray([20.0, 20.0, 0.0], jnp.float32)
    radii, valid = lidar.scan_revolution(fld, p0, angles, sim.max_scan_dist,
                                         0.0, jax.random.PRNGKey(0))
    pts = jnp.stack([radii * jnp.cos(angles), radii * jnp.sin(angles)], -1)

    hole = jnp.full(size * size, coreslam.HOLE_INIT, jnp.int32)
    for _ in range(8):   # carve the map at the true pose
        hole = holemap.update_hole_map(hole, size, scale, pts, valid, p0,
                                       cfg.hole_width, cfg.quality)

    prior = p0 + jnp.asarray([0.25, -0.2, math.radians(4.0)], jnp.float32)
    best, best_sum = correlate.correlative_search(
        hole, size, scale, pts, valid, prior, window=8, num_theta=33,
        theta_span=3.0 * cfg.sigma_theta)
    err = np.asarray(best) - np.asarray(p0)
    assert np.linalg.norm(err[:2]) < 1.5 / scale, err     # within ~1.5 px
    assert abs(err[2]) < math.radians(1.5), err


def test_all_oob_scores_intmax():
    size, scale = 32, 1.0
    hole = jnp.zeros(size * size, jnp.int32)
    pts = jnp.full((4, 2), 500.0, jnp.float32)    # far outside
    best, best_sum = correlate.correlative_search(
        hole, size, scale, pts, jnp.ones(4, bool),
        jnp.asarray([1000.0, 1000.0, 0.0], jnp.float32),
        window=4, num_theta=3, theta_span=0.1)
    assert int(best_sum) == 2**31 - 1


def test_coreslam_tracks_with_correlative_search():
    cfg = CoreSlamConfig(search_mode="correlative", dense_hole_fill=True,
                         dense_obstacle_fill=True)
    sim = SimConfig()
    fld = default_field()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))
    traj = loop_trajectory(speed=0.3)[:150]
    state = coreslam.init(cfg, traj[0], key=jax.random.PRNGKey(2))

    @jax.jit
    def step(state, real_pose, key):
        radii, valid = lidar.scan_revolution(fld, real_pose, angles,
                                             sim.max_scan_dist,
                                             sim.measure_error, key)
        pts = jnp.stack([radii * jnp.cos(angles), radii * jnp.sin(angles)], -1)
        cloud = Scan(pts, valid, jnp.zeros(3, jnp.float32))
        return coreslam.update_cloud(state, cloud, state.pose, cfg)

    key = jax.random.PRNGKey(3)
    errs = []
    for t in range(traj.shape[0]):
        key, sub = jax.random.split(key)
        state, _ = step(state, jnp.asarray(traj[t]), sub)
        errs.append(np.asarray(state.pose) - traj[t])
    errs = np.asarray(errs)
    pos_err = np.linalg.norm(errs[:, :2], axis=1)
    assert np.sqrt((pos_err ** 2).mean()) < 0.5
    assert pos_err.max() < 1.0, pos_err.max()
    assert np.abs(errs[:, 2]).max() < math.radians(10.0)
