"""Pallas one-hot GN matcher: interpret-mode parity vs the XLA onehot path.

The kernel (ops/pallas_onehot.py) reuses the one-hot selection semantics —
a bf16 one-hot row picks a single bf16-rounded table entry, exactly like the
XLA onehot_bf16 matcher — so the two paths see IDENTICAL neighbor values;
only float summation order differs in the (H, dTr) reductions.  Poses must
agree to float tolerance over the full 15-iteration 3-level match.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slamnet_tpu.core import HectorConfig, SimConfig
from slamnet_tpu.core.scan import Scan
from slamnet_tpu.models import hector
from slamnet_tpu.sim import default_field, lidar


def _boot_state(cfg, truth, angles, sim, scans=6, seed=0):
    fld = default_field()
    state = hector.init(cfg, truth)
    key = jax.random.PRNGKey(seed)
    for _ in range(scans):
        key, sub = jax.random.split(key)
        radii, valid = lidar.scan_revolution(fld, truth, angles,
                                             sim.max_scan_dist,
                                             sim.measure_error, sub)
        pts = jnp.stack([radii * jnp.cos(angles),
                         radii * jnp.sin(angles)], -1)
        state, _ = hector.update(state, Scan(pts, valid, jnp.zeros(3)),
                                 truth, cfg, map_without_matching=True)
    key, sub = jax.random.split(key)
    radii, valid = lidar.scan_revolution(fld, truth, angles,
                                         sim.max_scan_dist,
                                         sim.measure_error, sub)
    pts = jnp.stack([radii * jnp.cos(angles), radii * jnp.sin(angles)], -1)
    return state, Scan(pts, valid, jnp.zeros(3))


def test_pallas_match_parity_vs_xla_onehot():
    cfg = HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4))
    sim = SimConfig()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))
    truth = jnp.asarray([20.0, 20.0, 0.0], jnp.float32)
    state, scan = _boot_state(cfg, truth, angles, sim)
    hint = truth + jnp.asarray([0.2, -0.15, 0.04])

    oh = dataclasses.replace(cfg, matcher_mode="onehot_bf16")
    pose_x, stats_x = hector.match_with_stats(state.maps, scan, hint, oh)

    pk = dataclasses.replace(cfg, matcher_mode="pallas")
    pose_p, stats_p = hector.match_with_stats(state.maps, scan, hint, pk)

    # both converge to the true pose...
    assert float(jnp.linalg.norm(pose_p[:2] - truth[:2])) < 0.05
    # ...and agree to float tolerance (summation order differs)
    np.testing.assert_allclose(np.asarray(pose_p), np.asarray(pose_x),
                               atol=2e-3)
    assert int(stats_p.solve_failures) == int(stats_x.solve_failures) == 0
    np.testing.assert_allclose(float(stats_p.residual),
                               float(stats_x.residual), rtol=0.05)


def test_pallas_match_empty_scan_returns_hint():
    cfg = dataclasses.replace(
        HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4)),
        matcher_mode="pallas")
    n = 400
    scan = Scan(jnp.zeros((n, 2), jnp.float32), jnp.zeros(n, bool),
                jnp.zeros(3, jnp.float32))
    maps = jnp.zeros(cfg.total_cells, jnp.float32)
    hint = jnp.asarray([20.0, 20.0, 0.5], jnp.float32)
    pose, _ = hector.match_with_stats(maps, scan, hint, cfg)
    np.testing.assert_allclose(np.asarray(pose), np.asarray(hint), atol=1e-6)


def test_pallas_match_with_guards_and_subsample():
    # the production knobs thread through: xy clamp, damping, subsample
    cfg = dataclasses.replace(
        HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4)),
        matcher_mode="pallas", xy_step_clamp_px=10.0, gn_damping=0.1,
        match_subsample=4)
    sim = SimConfig()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))
    truth = jnp.asarray([20.0, 20.0, 0.0], jnp.float32)
    state, scan = _boot_state(
        cfg, truth, angles, sim, seed=2)
    hint = truth + jnp.asarray([0.15, 0.1, -0.03])
    pose, stats = hector.match_with_stats(state.maps, scan, hint, cfg)
    assert float(jnp.linalg.norm(pose[:2] - truth[:2])) < 0.08
    xla = dataclasses.replace(cfg, matcher_mode="onehot_bf16")
    pose_x, _ = hector.match_with_stats(state.maps, scan, hint, xla)
    np.testing.assert_allclose(np.asarray(pose), np.asarray(pose_x),
                               atol=3e-3)
