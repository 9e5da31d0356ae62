"""Pallas dense polar fill vs the XLA formulation (VERDICT round-1 task 3).

The kernel avoids atan2 (unimplemented in Mosaic) by sweeping sector boundary
rays, so cells exactly on a bin boundary may land in the adjacent bin — the
assertions allow a <1% boundary-cell discrepancy and require everything else
(occupied endpoints, log-odds arithmetic, non-boundary free cells) identical.
On-hardware compile + timing live in scripts/bench_pallas_fill.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

from slamnet_tpu.ops import logodds, pallas_fill


def _scene(seed, W=128, n=200):
    rng = np.random.default_rng(seed)
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    r = rng.uniform(2.0, 18.0, n)
    pts = np.stack([r * np.cos(ang), r * np.sin(ang)], -1).astype(np.float32)
    valid = jnp.asarray(rng.uniform(size=n) > 0.1)
    maps = jnp.asarray(rng.normal(0, 1, W * W), jnp.float32)
    return jnp.asarray(pts), valid, maps


def test_matches_xla_dense_fill():
    W = 128
    for seed, pose in ((0, (9.0, 11.0, 0.3)), (1, (14.0, 6.0, -1.2))):
        pts, valid, maps = _scene(seed, W)
        pose = jnp.asarray(pose, jnp.float32)
        sp = jnp.zeros(2, jnp.float32)
        a = logodds.update_occupancy_dense(maps, W, pts, valid, pose, sp,
                                           3.0, -0.4, 2.2)
        b = pallas_fill.update_occupancy_dense_pallas(
            maps, W, pts, valid, pose, sp, 3.0, -0.4, 2.2, interpret=True)
        d = np.asarray(a) != np.asarray(b)
        assert d.mean() < 0.01, d.mean()
        # every difference is exactly one log_odds_free step (a boundary cell
        # binned into the neighboring sector) — never an occupied disagreement
        delta = np.abs(np.asarray(a) - np.asarray(b))[d]
        np.testing.assert_allclose(delta, 0.4, atol=1e-6)


def test_no_beams_no_free_marking():
    W = 128
    pts, _, maps = _scene(2, W)
    valid = jnp.zeros(pts.shape[0], bool)
    pose = jnp.asarray((9.0, 11.0, 0.0), jnp.float32)
    out = pallas_fill.update_occupancy_dense_pallas(
        maps, W, pts, valid, pose, jnp.zeros(2, jnp.float32), 3.0, -0.4, 2.2,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(maps))


def test_occupied_cap_respected():
    W = 128
    pts, valid, maps = _scene(3, W)
    maps = jnp.full_like(maps, 60.0)        # everything above the cap
    pose = jnp.asarray((9.0, 11.0, 0.0), jnp.float32)
    out = pallas_fill.update_occupancy_dense_pallas(
        maps, W, pts, valid, pose, jnp.zeros(2, jnp.float32), 3.0, -0.4, 2.2,
        occupied_cap=50.0, interpret=True)
    # occupied increments suppressed; only free decrements remain
    assert float(np.asarray(out).max()) <= 60.0
    assert not np.any(np.asarray(out) > 60.0)
