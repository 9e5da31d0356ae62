"""CoreSLAM kernel tests: scoring vs the sequential golden, map updates vs
beam-by-beam sequential composition."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from slamnet_tpu.ops import holemap, obstacle, score

import golden


def _random_map(rng, size):
    return rng.integers(0, 65500, size * size).astype(np.int32)


def test_score_matches_golden():
    size, scale = 64, 64 / 40.0
    rng = np.random.default_rng(0)
    pixels = _random_map(rng, size)
    n = 100
    pts = rng.uniform(-25, 25, (n, 2)).astype(np.float32)
    poses = rng.uniform(-5, 45, (8, 3)).astype(np.float32)
    poses[:, 2] = rng.uniform(-math.pi, math.pi, 8)

    sums, nb = score.score_candidates(jnp.asarray(pixels), size, scale,
                                      jnp.asarray(pts),
                                      jnp.ones(n, bool), jnp.asarray(poses))
    for i in range(8):
        want_sum, want_nb, _ = golden.calculate_distance(pts, poses[i], pixels,
                                                         size, scale)
        assert int(sums[i]) == want_sum, i
        assert int(nb[i]) == want_nb, i


def test_score_out_of_bounds_candidate_is_intmax():
    size, scale = 64, 1.6
    pixels = jnp.zeros(size * size, jnp.int32)
    pts = jnp.asarray([[1.0, 0.0]], jnp.float32)
    poses = jnp.asarray([[1000.0, 1000.0, 0.0]], jnp.float32)
    sums, nb = score.score_candidates(pixels, size, scale, pts,
                                      jnp.ones(1, bool), poses)
    assert int(nb[0]) == 0
    s = score.reference_score(sums, nb, 1)
    assert int(s[0]) == 2**31 - 1


def test_monte_carlo_finds_planted_optimum():
    # plant a deep hole field: score is minimized at the true pose
    size, scale = 64, 64 / 40.0
    rng = np.random.default_rng(1)
    true_pose = np.array([20.0, 20.0, 0.3], np.float32)
    # ring of points at 5 m around the robot
    ang = rng.uniform(0, 2 * np.pi, 200)
    pts_world = np.stack([true_pose[0] + 5 * np.cos(ang),
                          true_pose[1] + 5 * np.sin(ang)], -1)
    # hole map: 0 at ring points, 65500 elsewhere
    pixels = np.full(size * size, 65500, np.int32)
    xi = (pts_world[:, 0] * scale + 0.5).astype(int)
    yi = (pts_world[:, 1] * scale + 0.5).astype(int)
    pixels[yi * size + xi] = 0
    # robot-local points (at true heading)
    c, s = math.cos(true_pose[2]), math.sin(true_pose[2])
    local = np.stack([ (pts_world[:, 0]-true_pose[0])*c + (pts_world[:, 1]-true_pose[1])*s,
                      -(pts_world[:, 0]-true_pose[0])*s + (pts_world[:, 1]-true_pose[1])*c], -1)

    start = jnp.asarray(true_pose + np.array([0.3, -0.25, 0.1], np.float32))
    best, best_sum = score.monte_carlo_search(
        jnp.asarray(pixels), size, scale, jnp.asarray(local, jnp.float32),
        jnp.ones(200, bool), start, 0.2, 0.15, 4096, jax.random.PRNGKey(7))
    err = np.asarray(best) - true_pose
    assert abs(err[0]) < 0.35 and abs(err[1]) < 0.35  # found the basin
    assert int(best_sum) < 200 * 65500 // 4           # far better than random


def _sequential_hole_update(pixels, size, scale, pts, pose, hole_width, quality):
    """Beam-by-beam golden using the reference draw order."""
    px = np.float32(pose[0] * scale + 0.5)
    py = np.float32(pose[1] * scale + 0.5)
    c = np.float32(math.cos(pose[2]) * scale)
    s = np.float32(math.sin(pose[2]) * scale)
    x1, y1 = int(px), int(py)
    if not (0 <= x1 < size and 0 <= y1 < size):
        return pixels
    for X, Y in pts:
        x2p = np.float32(c * X - s * Y)
        y2p = np.float32(s * X + c * Y)
        xp, yp = int(px + x2p), int(py + y2p)
        dist = math.sqrt(float(x2p) ** 2 + float(y2p) ** 2)
        if dist <= 1e-6:
            continue
        add = np.float32(hole_width * scale / 2.0 / dist)
        x2 = int(px + x2p * (1 + add))
        y2 = int(py + y2p * (1 + add))
        draws = golden.hole_ray_draw(x1, y1, x2, y2, xp, yp, 0, 65500, size)
        golden.hole_map_blend(pixels, draws, quality)
    return pixels


def test_hole_map_update_close_to_sequential():
    size, scale = 64, 64 / 40.0
    rng = np.random.default_rng(2)
    pose = np.array([20.0, 20.0, 0.4], np.float32)
    n = 120
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    r = rng.uniform(3.0, 18.0, n)
    pts = np.stack([r * np.cos(ang), r * np.sin(ang)], -1).astype(np.float32)

    init = np.full(size * size, 32750, np.int32)
    want = _sequential_hole_update(init.copy(), size, scale, pts, pose, 2.0, 50)

    got = np.asarray(holemap.update_hole_map(
        jnp.asarray(init), size, scale, jnp.asarray(pts), jnp.ones(n, bool),
        jnp.asarray(pose), 2.0, 50))

    # visited-cell sets agree except where a multi-visit blend lands exactly on
    # the init value (value==init is only a proxy for "visited")
    assert ((got != init) != (want != init)).sum() <= 30
    # once-visited pixels must match EXACTLY (the composed blend is exact for k=1)
    diff = np.abs(got.astype(np.int64) - want.astype(np.int64))
    assert np.median(diff[want != init]) == 0
    # multi-visit pixels: bounded divergence (documented approximation — the mean
    # blend lies between the order-dependent sequential outcomes)
    assert diff.max() <= 7000
    frac_exact = (diff == 0).mean()
    assert frac_exact > 0.94


def test_hole_map_sequential_mode_bitexact():
    size, scale = 64, 64 / 40.0
    rng = np.random.default_rng(3)
    pose = np.array([17.0, 23.0, -0.7], np.float32)
    n = 80
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    r = rng.uniform(2.0, 25.0, n)
    pts = np.stack([r * np.cos(ang), r * np.sin(ang)], -1).astype(np.float32)

    init = np.full(size * size, 32750, np.int32)
    want = _sequential_hole_update(init.copy(), size, scale, pts, pose, 2.0, 50)
    got = np.asarray(holemap.update_hole_map_sequential_blend(
        jnp.asarray(init), size, scale, jnp.asarray(pts), jnp.ones(n, bool),
        jnp.asarray(pose), 2.0, 50))
    np.testing.assert_array_equal(got, want)


def _sequential_obstacle_update(pixels, size, scale, pts, pose, max_hits):
    """UpdateObstacleMap golden (CoreSLAMProcessor.cs:540-593)."""
    px = np.float32(pose[0] * scale + 0.5)
    py = np.float32(pose[1] * scale + 0.5)
    c = np.float32(math.cos(pose[2]) * scale)
    s = np.float32(math.sin(pose[2]) * scale)
    x1, y1 = int(px), int(py)
    if not (0 <= x1 < size and 0 <= y1 < size):
        return pixels
    nohit = np.zeros((size, size), bool)
    for X, Y in pts:
        x2 = int(px + c * X - s * Y)
        y2 = int(py + s * X + c * Y)
        cells, hit = golden.rosetta_obstacle_ray((x1, y1), (x2, y2), size)
        for (x, y) in cells:
            nohit[y, x] = True
        if hit is not None:
            hx, hy = hit
            if pixels[hy, hx] < max_hits:
                pixels[hy, hx] += 1
    for y in range(size):
        for x in range(size):
            if nohit[y, x]:
                if pixels[y, x] < 0:
                    pixels[y, x] += 1
                elif pixels[y, x] > 0:
                    pixels[y, x] -= 1
    return pixels


def test_obstacle_map_update_bitexact():
    size, scale = 64, 64 / 40.0
    rng = np.random.default_rng(4)
    pose = np.array([20.0, 20.0, 0.2], np.float32)
    n = 150
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    r = rng.uniform(1.0, 30.0, n)
    pts = np.stack([r * np.cos(ang), r * np.sin(ang)], -1).astype(np.float32)

    init = np.full((size, size), -5, np.int8)
    state = init.copy().astype(np.int64)
    # run three scans sequentially to exercise cap + decay interplay
    want = state
    got = jnp.asarray(init)
    for it in range(3):
        want = _sequential_obstacle_update(want, size, scale, pts, pose, 10)
        got = obstacle.update_obstacle_map(got, size, scale, jnp.asarray(pts),
                                           jnp.ones(n, bool), jnp.asarray(pose), 10)
    np.testing.assert_array_equal(np.asarray(got).astype(np.int64), want)


def test_obstacle_robot_out_of_map_is_noop():
    size = 32
    init = jnp.full((size, size), -5, jnp.int8)
    out = obstacle.update_obstacle_map(
        init, size, 1.0, jnp.asarray([[1.0, 1.0]]), jnp.ones(1, bool),
        jnp.asarray([100.0, 100.0, 0.0]), 10)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(init))
