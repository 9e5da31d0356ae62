"""Batched particle SLAM layer: localization on the simulator."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from slamnet_tpu.core import CoreSlamConfig, ParticleConfig, SimConfig
from slamnet_tpu.core.scan import Scan
from slamnet_tpu.models import particle
from slamnet_tpu.sim import default_field, lidar
from slamnet_tpu.sim.trajectory import loop_trajectory, stationary_trajectory


def _run(traj, num_particles=512, top_k=16, refine=16, key=None, **pknobs):
    ccfg = CoreSlamConfig()
    pcfg = ParticleConfig(num_particles=num_particles, top_k=top_k,
                          refine_candidates=refine, **pknobs)
    sim = SimConfig()
    fld = default_field()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))
    key = key if key is not None else jax.random.PRNGKey(0)
    state = particle.init(ccfg, pcfg, traj[0])

    @jax.jit
    def step(state, real_pose, key):
        radii, valid = lidar.scan_revolution(fld, real_pose, angles,
                                             sim.max_scan_dist,
                                             sim.measure_error, key)
        pts = jnp.stack([radii * jnp.cos(angles), radii * jnp.sin(angles)], -1)
        cloud = Scan(pts, valid, jnp.zeros(3, jnp.float32))
        return particle.update(state, cloud, state.pose, ccfg, pcfg)

    errs, infos = [], []
    for t in range(traj.shape[0]):
        key, sub = jax.random.split(key)
        state, info = step(state, jnp.asarray(traj[t]), sub)
        errs.append(np.asarray(state.pose) - traj[t])
        infos.append(info)
    return state, np.asarray(errs), infos


def test_stationary_particle_lock():
    traj = stationary_trajectory(num_scans=30)
    state, errs, infos = _run(traj)
    pos = np.linalg.norm(errs[:, :2], axis=1)
    assert pos.max() < 0.3, pos.max()
    assert np.abs(errs[:, 2]).max() < math.radians(5.0)
    # population stays coherent around the estimate
    spread = np.asarray(state.particles[:, :2]).std(axis=0).max()
    assert spread < 1.0


def test_loop_particle_tracking():
    traj = loop_trajectory(speed=0.3)[:250]
    state, errs, infos = _run(traj)
    pos = np.linalg.norm(errs[:, :2], axis=1)
    assert pos.max() < 1.0, pos.max()
    assert np.abs(errs[:, 2]).max() < math.radians(10.0)


def test_ess_and_resampling_sane():
    traj = stationary_trajectory(num_scans=20)
    _, _, infos = _run(traj)
    ess = np.asarray([float(i.ess) for i in infos])
    assert np.all(ess >= 1.0) and np.all(ess <= 512.0)


def test_grid_scorer_on_node_scores_are_exact():
    """A particle sitting exactly on a grid node (bin-center theta, integer
    pixel shift) must read the SAME sum the exact scorer computes for that
    pose (correlative_scores == score_candidates for interior points)."""
    ccfg = CoreSlamConfig()
    pcfg = ParticleConfig(num_particles=8, top_k=4, refine_candidates=4,
                          scorer="grid")
    sim = SimConfig()
    fld = default_field()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))
    radii, valid = lidar.scan_revolution(fld, jnp.asarray([20.0, 20.0, 0.0]),
                                         angles, sim.max_scan_dist,
                                         sim.measure_error,
                                         jax.random.PRNGKey(3))
    pts = jnp.stack([radii * jnp.cos(angles), radii * jnp.sin(angles)], -1)
    cloud = Scan(pts, valid, jnp.zeros(3, jnp.float32))
    state = particle.init(ccfg, pcfg, [20.0, 20.0, 0.0])
    # warm the hole map once so scores are non-trivial
    state, _ = particle.update(state, cloud, state.pose, ccfg, pcfg)

    search = jnp.asarray([20.0, 20.0, 0.0], jnp.float32)
    span = 3.0 * ccfg.sigma_theta
    K = ccfg.corr_num_theta
    bins = np.asarray(jnp.linspace(-span, span, K))  # the grid's exact thetas
    # poses exactly on grid nodes: (pixel shift dx, dy, theta-bin index)
    nodes = np.array([[0, 0, 15], [0, 0, 16], [0, 0, 12], [0, 0, 20],
                      [1, 0, 16], [0, -2, 15], [1, 1, 18], [-2, 1, 13]])
    poses = jnp.asarray(
        np.stack([20.0 + nodes[:, 0] / ccfg.hole_scale,
                  20.0 + nodes[:, 1] / ccfg.hole_scale,
                  bins[nodes[:, 2]]], -1), jnp.float32)
    eff_grid, gpose, gsum = particle._grid_score(state, ccfg, cloud, search,
                                                 poses)
    eff_exact = particle._score(state, ccfg, cloud.points, cloud.valid, poses)
    g, e = np.asarray(eff_grid), np.asarray(eff_exact)
    # zero-shift on-bin poses run the IDENTICAL float pipeline -> exact equal
    zero_shift = (nodes[:, 0] == 0) & (nodes[:, 1] == 0)
    np.testing.assert_array_equal(g[zero_shift], e[zero_shift])
    # shifted nodes: base-snap+shift vs particle-snap can flip points sitting
    # on truncation boundaries (correlate.py docstring) — bounded, tiny
    rel = np.abs(g - e) / np.maximum(e, 1)
    assert rel.max() < 0.02, (g, e, rel)
    # the injected grid argmin is a real pose with a finite score
    assert np.isfinite(np.asarray(gpose)).all()
    assert int(gsum) < int(particle.score.INT32_MAX)


def test_grid_scorer_tracks_loop():
    traj = loop_trajectory(speed=0.3)[:120]
    state, errs, _ = _run(traj, scorer="grid", refine_subsample=4)
    pos = np.linalg.norm(errs[:, :2], axis=1)
    assert pos.max() < 1.0, pos.max()
    assert np.abs(errs[:, 2]).max() < math.radians(10.0)


def test_subsampled_scoring_tracks_loop():
    traj = loop_trajectory(speed=0.3)[:120]
    state, errs, _ = _run(traj, score_subsample=4, refine_subsample=4)
    pos = np.linalg.norm(errs[:, :2], axis=1)
    assert pos.max() < 1.0, pos.max()


def test_baseline_config4_8k_compiles_and_tracks():
    # BASELINE config 4 at FULL scale: 8192 particles, top-64, 64 refine —
    # the exact bench.py configuration — must compile and track a short
    # stationary window (throughput is measured on the chip by bench.py)
    traj = stationary_trajectory(num_scans=8)
    state, errs, infos = _run(traj, num_particles=8192, top_k=64, refine=64)
    pose = np.asarray(state.pose)
    assert np.isfinite(pose).all()
    err = np.linalg.norm(pose[:2] - np.asarray(traj[-1][:2]))
    assert err < 0.3, (pose, traj[-1])
