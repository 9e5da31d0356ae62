"""End-to-end CoreSLAM: simulator scans -> Monte-Carlo localization + mapping.

The reference's verification strategy turned into real assertions (SURVEY.md §4):
the simulator's divergence oracle (MainWindow.xaml.cs:182-196) becomes ATE bounds
against ground truth.  Mirrors the simulator wiring: the scan segments are tagged
with CoreSLAM's own estimated pose as the odometry stand-in
(MainWindow.xaml.cs:159,380-407).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slamnet_tpu.core import CoreSlamConfig, SimConfig
from slamnet_tpu.core.scan import Scan
from slamnet_tpu.models import coreslam
from slamnet_tpu.sim import default_field, lidar
from slamnet_tpu.sim.trajectory import loop_trajectory, stationary_trajectory


def _run(cfg, traj, key, num_candidates=1024):
    cfg = CoreSlamConfig(num_candidates=num_candidates)
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
        # odometry stand-in: CoreSLAM's own previous estimate (the simulator has
        # no odometry; MainWindow.xaml.cs:159 passes coreSlam.Pose)
        return coreslam.update_cloud(state, cloud, state.pose, cfg)

    errs = []
    for t in range(traj.shape[0]):
        key, sub = jax.random.split(key)
        state, info = step(state, jnp.asarray(traj[t]), sub)
        errs.append(np.asarray(state.pose) - traj[t])
    return state, np.asarray(errs)


def test_stationary_localization_stays_locked():
    traj = stationary_trajectory(num_scans=40)
    state, errs = _run(None, traj, jax.random.PRNGKey(0))
    # position error under 0.3 m and heading under 5 deg for the whole run
    pos_err = np.linalg.norm(errs[:, :2], axis=1)
    assert pos_err.max() < 0.3, pos_err.max()
    assert np.abs(errs[:, 2]).max() < math.radians(5.0)


def test_loop_localization_within_reference_envelope():
    # CoreSLAM's documented behavior: tracks pose but map may drift "a little"
    # (README.md:22).  Assert the divergence-oracle bounds the simulator uses for
    # Hector (1 m / 10 deg, MainWindow.xaml.cs:187) over a 30 s loop segment.
    traj = loop_trajectory(speed=0.3)[:500]
    state, errs = _run(None, traj, jax.random.PRNGKey(1))
    pos_err = np.linalg.norm(errs[:, :2], axis=1)
    ate = np.sqrt((pos_err ** 2).mean())
    assert ate < 0.5, ate
    assert pos_err.max() < 1.0, pos_err.max()
    assert np.abs(errs[:, 2]).max() < math.radians(10.0)


def test_hole_map_carves_structure():
    traj = stationary_trajectory(num_scans=12)
    state, _ = _run(None, traj, jax.random.PRNGKey(2))
    hm = np.asarray(state.hole_map)
    # free space pushed up toward TS_NO_OBSTACLE, holes carved to low values
    assert (hm > 60000).sum() > 1000      # carved free space
    assert (hm < 5000).sum() > 50         # obstacle holes
    assert (hm == coreslam.HOLE_INIT).sum() > 10000  # unexplored remains


def test_obstacle_map_marks_walls():
    traj = stationary_trajectory(num_scans=12)
    state, _ = _run(None, traj, jax.random.PRNGKey(3))
    om = np.asarray(state.obstacle_map)
    assert (om > 0).sum() > 30            # wall cells accumulate hits
    assert (om == 0).sum() > 200          # cleared free space
    assert (om == -5).sum() > 1000        # unexplored
