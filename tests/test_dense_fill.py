"""Dense polygon-fill occupancy mode: consistency with line mode + e2e tracking."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from slamnet_tpu.core import HectorConfig, SimConfig
from slamnet_tpu.core.scan import Scan
from slamnet_tpu.ops import logodds
from slamnet_tpu.models import hector
from slamnet_tpu.sim import default_field, lidar
from slamnet_tpu.sim.trajectory import loop_trajectory


def test_dense_fill_superset_of_lines_and_same_occ():
    # smooth range profile (a rotating lidar in a room) — the dense mode's
    # conservative bin-min is only tight for smooth fields; wildly random
    # radii are out of its contract
    width, scale = 128, 3.2
    pose = jnp.asarray([20.0, 20.0, 0.3], jnp.float32)
    n = 200
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    r = 10.0 + 4.0 * np.sin(3 * ang)
    pts = np.stack([r * np.cos(ang), r * np.sin(ang)], -1).astype(np.float32)
    lo0 = jnp.zeros(width * width, jnp.float32)
    lof, loo = -0.405, 2.197

    lines = np.asarray(logodds.update_occupancy(
        lo0, width, jnp.asarray(pts), jnp.ones(n, bool), pose,
        jnp.zeros(2, jnp.float32), scale, lof, loo))
    dense = np.asarray(logodds.update_occupancy_dense(
        lo0, width, jnp.asarray(pts), jnp.ones(n, bool), pose,
        jnp.zeros(2, jnp.float32), scale, lof, loo))

    # identical occupied endpoints
    np.testing.assert_array_equal(lines > 1.0, dense > 1.0)
    # free marking: dense covers most line-marked free cells (the conservative
    # bin-min truncates only the outermost cells of beams sharing a bin with a
    # shorter neighbor — the documented contract)
    line_free = lines < -0.1
    dense_free = dense < -0.1
    covered = (line_free & dense_free).sum() / max(line_free.sum(), 1)
    assert covered > 0.75, covered
    # comparable total free evidence (fills between beams, trims endpoint tails)
    assert dense_free.sum() > 0.8 * line_free.sum()
    # dense never marks an occupied endpoint free
    assert not (dense_free & (lines > 1.0)).any()


def test_dense_fill_no_beams_is_noop():
    width = 32
    lo0 = jnp.ones(width * width, jnp.float32) * 0.5
    out = logodds.update_occupancy_dense(
        lo0, width, jnp.zeros((4, 2), jnp.float32), jnp.zeros(4, bool),
        jnp.asarray([5.0, 5.0, 0.0]), jnp.zeros(2), 1.0, -0.4, 2.2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(lo0))


def test_hector_tracks_with_dense_fill():
    cfg = HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4),
                       dense_free_fill=True)
    sim = SimConfig()
    fld = default_field()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))
    traj = loop_trajectory(speed=0.3)[:150]
    key = jax.random.PRNGKey(0)
    state = hector.init(cfg, traj[0])

    @jax.jit
    def step(state, real_pose, key, boot):
        radii, valid = lidar.scan_revolution(fld, real_pose, angles,
                                             sim.max_scan_dist,
                                             sim.measure_error, key)
        pts = jnp.stack([radii * jnp.cos(angles), radii * jnp.sin(angles)], -1)
        return hector.update(state, Scan(pts, valid, jnp.zeros(3, jnp.float32)),
                             state.match_pose, cfg, map_without_matching=boot)

    errs = []
    for t in range(traj.shape[0]):
        key, sub = jax.random.split(key)
        state, _ = step(state, jnp.asarray(traj[t]), sub, jnp.asarray(t < 10))
        errs.append(np.asarray(state.match_pose) - traj[t])
    errs = np.asarray(errs)
    assert np.linalg.norm(errs[:, :2], axis=1).max() < 0.5
    assert np.abs(errs[:, 2]).max() < math.radians(5.0)
