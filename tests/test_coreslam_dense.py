"""Dense polar CoreSLAM map updates: consistency with line mode + e2e tracking.

Mirrors tests/test_dense_fill.py (Hector's dense mode): the dense fills are
documented-divergence production modes — on-ray behavior must agree with the
reference-parity line mode, off-ray they add evidence between beams.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from slamnet_tpu.core import CoreSlamConfig, SimConfig
from slamnet_tpu.core.scan import Scan
from slamnet_tpu.models import coreslam
from slamnet_tpu.ops import holemap, obstacle
from slamnet_tpu.sim import default_field, lidar
from slamnet_tpu.sim.trajectory import loop_trajectory, stationary_trajectory


def _smooth_scan(n=400):   # >= angle_bins (256) so every sector has a beam
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    r = 10.0 + 4.0 * np.sin(3 * ang)
    pts = np.stack([r * np.cos(ang), r * np.sin(ang)], -1).astype(np.float32)
    return jnp.asarray(pts), jnp.ones(n, bool)


def test_dense_hole_structure_matches_line_mode():
    size, scale = 256, 6.4
    pose = jnp.asarray([20.0, 20.0, 0.3], jnp.float32)
    pts, valid = _smooth_scan()
    init = jnp.full(size * size, coreslam.HOLE_INIT, jnp.int32)

    line = np.asarray(holemap.update_hole_map(
        init, size, scale, pts, valid, pose, 2.0, 50)).reshape(size, size)
    dense = np.asarray(holemap.update_hole_map_dense(
        init, size, scale, pts, valid, pose, 2.0, 50)).reshape(size, size)

    up = coreslam.HOLE_INIT + 2000       # blended toward NO_OBSTACLE
    down = coreslam.HOLE_INIT - 2000     # carved toward the hole bottom
    line_free, dense_free = line > up, dense > up
    line_hole, dense_hole = line < down, dense < down

    # dense covers the vast majority of line-mode free cells and carves holes
    # at (almost all of) the same places
    assert (line_free & dense_free).sum() / max(line_free.sum(), 1) > 0.85
    assert (line_hole & dense_hole).sum() / max(line_hole.sum(), 1) > 0.7
    # fills between beams: at least as much total evidence
    assert dense_free.sum() >= line_free.sum()
    # free-vs-hole disagreement only at sector (bin) boundaries — a small leak
    assert (dense_free & line_hole).sum() <= 0.02 * line_hole.sum()
    # dense blends each cell exactly once per scan: the deepest possible value
    # is ONE reference alpha blend of init toward TS_OBSTACLE.  (The line mode
    # goes deeper in one scan because adjacent beams' overlapping rasterized
    # lines re-blend dip cells once per crossing beam — the documented
    # convergence-rate difference of the single-observation semantics.)
    one_blend = (206 * coreslam.HOLE_INIT + 50 * holemap.TS_OBSTACLE) // 256
    assert one_blend <= dense.min() <= one_blend + 600
    assert line.min() <= dense.min()


def test_dense_hole_no_beams_is_noop():
    size = 64
    init = jnp.full(size * size, coreslam.HOLE_INIT, jnp.int32)
    out = holemap.update_hole_map_dense(
        init, size, 1.6, jnp.zeros((8, 2), jnp.float32), jnp.zeros(8, bool),
        jnp.asarray([20.0, 20.0, 0.0], jnp.float32), 2.0, 50)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(init))


def test_dense_obstacle_hits_exact_and_decay_consistent():
    size, scale = 64, 1.6
    pose = jnp.asarray([20.0, 20.0, 0.3], jnp.float32)
    pts, valid = _smooth_scan()

    # hits: both modes use the exact endpoint B-point scatter; on a zero map the
    # only possible divergence is the decay's -1 on hit cells that one mode's
    # traversed set includes and the other's doesn't (line vs polar geometry)
    zero = jnp.zeros((size, size), jnp.int8)
    line_h = np.asarray(obstacle.update_obstacle_map(
        zero, size, scale, pts, valid, pose, 10))
    dense_h = np.asarray(obstacle.update_obstacle_map_dense(
        zero, size, scale, pts, valid, pose, 10))
    assert np.abs(line_h.astype(int) - dense_h.astype(int)).max() <= 1
    assert (line_h == dense_h).mean() > 0.99
    # every line-mode hit is a dense-mode hit (hit set identical up to decay)
    assert not ((line_h > 0) & (dense_h < 0)).any()

    # decay region from the unmapped init: dense covers most line-traversed cells
    init = jnp.full((size, size), -5, jnp.int8)
    line = np.asarray(obstacle.update_obstacle_map(
        init, size, scale, pts, valid, pose, 10))
    dense = np.asarray(obstacle.update_obstacle_map_dense(
        init, size, scale, pts, valid, pose, 10))
    line_dec, dense_dec = line == -4, dense == -4
    assert (line_dec & dense_dec).sum() / max(line_dec.sum(), 1) > 0.8
    assert dense_dec.sum() >= 0.8 * line_dec.sum()


def _run_dense(traj, key, num_candidates=1024):
    cfg = CoreSlamConfig(num_candidates=num_candidates, dense_hole_fill=True,
                         dense_obstacle_fill=True)
    sim = SimConfig()
    fld = default_field()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))
    state = coreslam.init(cfg, traj[0], key=key)

    @jax.jit
    def step(state, real_pose, key):
        radii, valid = lidar.scan_revolution(fld, real_pose, angles,
                                             sim.max_scan_dist,
                                             sim.measure_error, key)
        pts = jnp.stack([radii * jnp.cos(angles), radii * jnp.sin(angles)], -1)
        cloud = Scan(pts, valid, jnp.zeros(3, jnp.float32))
        return coreslam.update_cloud(state, cloud, state.pose, cfg)

    errs = []
    for t in range(traj.shape[0]):
        key, sub = jax.random.split(key)
        state, info = step(state, jnp.asarray(traj[t]), sub)
        errs.append(np.asarray(state.pose) - traj[t])
    return state, np.asarray(errs)


def test_coreslam_tracks_with_dense_fills():
    traj = loop_trajectory(speed=0.3)[:200]
    state, errs = _run_dense(traj, jax.random.PRNGKey(4))
    pos_err = np.linalg.norm(errs[:, :2], axis=1)
    assert np.sqrt((pos_err ** 2).mean()) < 0.5
    assert pos_err.max() < 1.0, pos_err.max()
    assert np.abs(errs[:, 2]).max() < math.radians(10.0)
