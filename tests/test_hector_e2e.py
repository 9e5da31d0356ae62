"""End-to-end HectorSLAM on the simulator, mirroring the reference wiring:
10 bootstrap scans map-only, then self-hinted matching (MainWindow.xaml.cs:179),
asserted against the divergence oracle (1 m / 10 deg, :182-196)."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from slamnet_tpu.core import HectorConfig, SimConfig
from slamnet_tpu.core.scan import Scan
from slamnet_tpu.models import hector
from slamnet_tpu.sim import default_field, lidar
from slamnet_tpu.sim.trajectory import (loop_trajectory, spin_trajectory,
                                        stationary_trajectory)


def _run(traj, cfg=None, key=None, bootstrap=10):
    cfg = cfg or HectorConfig()
    sim = SimConfig()
    fld = default_field()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))
    key = key if key is not None else jax.random.PRNGKey(0)
    state = hector.init(cfg, traj[0])

    @jax.jit
    def step(state, real_pose, key, boot):
        radii, valid = lidar.scan_revolution(fld, real_pose, angles,
                                             sim.max_scan_dist,
                                             sim.measure_error, key)
        pts = jnp.stack([radii * jnp.cos(angles), radii * jnp.sin(angles)], -1)
        cloud = Scan(pts, valid, jnp.zeros(3, jnp.float32))
        return hector.update(state, cloud, state.match_pose, cfg,
                             map_without_matching=boot)

    errs, updates = [], 0
    for t in range(traj.shape[0]):
        key, sub = jax.random.split(key)
        state, info = step(state, jnp.asarray(traj[t]), sub,
                           jnp.asarray(t < bootstrap))
        errs.append(np.asarray(state.match_pose) - traj[t])
        updates += int(info.map_updated)
    return state, np.asarray(errs), updates


def test_stationary_lock():
    traj = stationary_trajectory(num_scans=30)
    state, errs, updates = _run(traj)
    pos = np.linalg.norm(errs[:, :2], axis=1)
    assert pos.max() < 0.15, pos.max()
    assert np.abs(errs[:, 2]).max() < math.radians(2.0)
    # stationary => only the forced bootstrap updates fire
    assert updates == 10


def test_loop_tracking_within_oracle():
    traj = loop_trajectory(speed=0.3)[:400]
    state, errs, updates = _run(traj)
    pos = np.linalg.norm(errs[:, :2], axis=1)
    ate = np.sqrt((pos ** 2).mean())
    assert ate < 0.25, ate
    assert pos.max() < 1.0, pos.max()
    assert np.abs(errs[:, 2]).max() < math.radians(10.0)
    # motion-gated updates: more than bootstrap, far fewer than every scan
    assert 10 < updates < 200


def test_spin_tracking():
    # hold still for the bootstrap (maps are built at the hint pose, exactly as
    # the reference does during its first 10 scans), then spin
    still = stationary_trajectory(num_scans=10)
    spin = spin_trajectory(num_scans=100)
    traj = np.concatenate([still, spin])
    state, errs, _ = _run(traj)
    # wrap-aware angular error
    ang = np.abs((errs[:, 2] + math.pi) % (2 * math.pi) - math.pi)
    assert ang.max() < math.radians(10.0), np.degrees(ang.max())
    assert np.linalg.norm(errs[:, :2], axis=1).max() < 0.5


def test_map_update_gating_thresholds():
    # barely-subthreshold motion must not trigger updates after bootstrap
    cfg = HectorConfig()
    start = np.array([20.0, 20.0, 0.0], np.float32)
    small = np.array([0.1, 0.0, 0.0], np.float32)  # < 0.4 m threshold
    traj = np.stack([start, start + small, start + 2 * small])
    state, errs, updates = _run(traj, cfg=cfg, bootstrap=1)
    assert updates == 1  # only the forced first scan


def test_early_exit_matches_fixed_iterations():
    # converged early-exit must track as well as the fixed budget
    traj = loop_trajectory(speed=0.3)[:150]
    _, errs_fixed, _ = _run(traj)
    cfg = HectorConfig(early_exit_tol=1e-3)
    _, errs_ee, _ = _run(traj, cfg=cfg)
    p_fixed = np.linalg.norm(errs_fixed[:, :2], axis=1)
    p_ee = np.linalg.norm(errs_ee[:, :2], axis=1)
    assert p_ee.max() < 0.3
    assert abs(p_ee.mean() - p_fixed.mean()) < 0.05


def test_matcher_health_info():
    # fixed-iteration mode reports the full budget, zero solve failures on a
    # warmed map, and a small positive residual
    cfg = HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4))
    traj = stationary_trajectory(num_scans=15)
    sim = SimConfig()
    fld = default_field()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))
    key = jax.random.PRNGKey(0)
    state = hector.init(cfg, traj[0])

    @jax.jit
    def step(state, real_pose, key, boot):
        radii, valid = lidar.scan_revolution(fld, real_pose, angles,
                                             sim.max_scan_dist,
                                             sim.measure_error, key)
        pts = jnp.stack([radii * jnp.cos(angles), radii * jnp.sin(angles)], -1)
        cloud = Scan(pts, valid, jnp.zeros(3, jnp.float32))
        return hector.update(state, cloud, state.match_pose, cfg,
                             map_without_matching=boot)

    info = None
    for t in range(15):
        key, sub = jax.random.split(key)
        state, info = step(state, jnp.asarray(traj[t]), sub,
                           jnp.asarray(t < 10))
    assert int(info.gn_iterations) == sum(cfg.estimate_iterations)
    assert int(info.solve_failures) == 0
    r = float(info.residual)
    assert 0.0 < r < 0.5, r

    # on an EMPTY map every H is singular: all iterations count as failures
    empty = hector.init(cfg, traj[0])
    _, stats = hector.match_with_stats(
        empty.maps,
        Scan(jnp.asarray(np.random.default_rng(0).uniform(-5, 5, (400, 2)),
                         jnp.float32), jnp.ones(400, bool),
             jnp.zeros(3, jnp.float32)),
        jnp.asarray(traj[0], jnp.float32), cfg)
    assert int(stats.solve_failures) == int(stats.iterations) \
        == sum(cfg.estimate_iterations)


def test_compat_angle_gate_ignores_negative_rotation():
    # the documented reference bug: with angle_gate_compat=True a negative
    # rotation alone never triggers a map update (SURVEY.md §2.3)
    cfg_fixed = HectorConfig()
    cfg_compat = HectorConfig(angle_gate_compat=True)
    start = np.array([20.0, 20.0, 0.0], np.float32)
    rot = np.array([0.0, 0.0, -0.3], np.float32)   # 17 deg > 8 deg threshold
    traj = np.stack([start, start + rot, start + 2 * rot])
    _, _, upd_fixed = _run(traj, cfg=cfg_fixed, bootstrap=1)
    _, _, upd_compat = _run(traj, cfg=cfg_compat, bootstrap=1)
    assert upd_fixed == 3      # |rad_diff| gate fires on both rotations
    assert upd_compat == 1     # signed DegDiff gate never fires


def test_max_match_jump_rejects_large_moves():
    # mechanism test for the production robustness knob: bootstrap a map at
    # the true pose, then hand the matcher a hint 1 m off.  The default
    # config snaps most of the way back (a ~1 m move); with
    # max_match_jump=0.3 that physically-impossible per-scan move is
    # rejected and the hint is kept verbatim.
    import dataclasses
    sim = SimConfig()
    fld = default_field()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))
    truth = jnp.asarray([20.0, 20.0, 0.0], jnp.float32)
    cfg = HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4))
    state = hector.init(cfg, truth)
    key = jax.random.PRNGKey(0)
    for t in range(8):
        key, sub = jax.random.split(key)
        radii, valid = lidar.scan_revolution(fld, truth, angles,
                                             sim.max_scan_dist,
                                             sim.measure_error, sub)
        pts = jnp.stack([radii * jnp.cos(angles), radii * jnp.sin(angles)], -1)
        state, _ = hector.update(state, Scan(pts, valid, jnp.zeros(3)),
                                 truth, cfg, map_without_matching=True)

    key, sub = jax.random.split(key)
    radii, valid = lidar.scan_revolution(fld, truth, angles,
                                         sim.max_scan_dist,
                                         sim.measure_error, sub)
    pts = jnp.stack([radii * jnp.cos(angles), radii * jnp.sin(angles)], -1)
    hint = truth + jnp.asarray([1.0, 0.0, 0.0])

    plain, _ = hector.update(state, Scan(pts, valid, jnp.zeros(3)), hint, cfg)
    moved = float(jnp.linalg.norm(plain.match_pose[:2] - hint[:2]))
    assert moved > 0.5, moved          # it really does move ~1 m

    guard = dataclasses.replace(cfg, max_match_jump=0.3)
    held, _ = hector.update(state, Scan(pts, valid, jnp.zeros(3)), hint,
                            guard)
    np.testing.assert_array_equal(np.asarray(held.match_pose),
                                  np.asarray(hint))
