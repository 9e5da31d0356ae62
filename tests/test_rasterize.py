"""Closed-form rasterization vs sequential numpy goldens — exhaustive cross-checks."""
import numpy as np
import jax.numpy as jnp

from slamnet_tpu.ops import rasterize as rz

import golden


def test_idiv_trunc_matches_csharp():
    rng = np.random.default_rng(0)
    a = rng.integers(-1000, 1000, 500)
    b = rng.integers(1, 50, 500) * rng.choice([-1, 1], 500)
    got = np.asarray(rz.idiv_trunc(jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray([golden.csharp_div(int(x), int(y)) for x, y in zip(a, b)])
    np.testing.assert_array_equal(got, want)


def test_hector_line_cells_exhaustive_small():
    width = 16
    begins, ends = [], []
    for bx in range(0, 16, 3):
        for by in range(0, 16, 3):
            for ex in range(0, 16, 2):
                for ey in range(0, 16, 2):
                    if (bx, by) != (ex, ey):
                        begins.append((bx, by))
                        ends.append((ex, ey))
    b = jnp.asarray(begins, jnp.int32)
    e = jnp.asarray(ends, jnp.int32)
    cells = rz.hector_line_cells(b, e, width, max_steps=32)
    flat = np.asarray(cells.flat)
    mask = np.asarray(cells.mask)
    for i in range(len(begins)):
        want = golden.hector_bresenham_free_cells(begins[i], ends[i], width)
        got = flat[i][mask[i]].tolist()
        assert got == want, (begins[i], ends[i])


def test_rosetta_cells_random():
    size = 64
    rng = np.random.default_rng(1)
    begins = rng.integers(0, size, (300, 2))
    # include endpoints outside the map to exercise the walk-off-the-map path
    ends = rng.integers(-30, size + 30, (300, 2))
    cells, end_flat, end_ok = rz.rosetta_line_cells(
        jnp.asarray(begins, jnp.int32), jnp.asarray(ends, jnp.int32), size,
        max_steps=2 * size)
    flat = np.asarray(cells.flat)
    mask = np.asarray(cells.mask)
    for i in range(len(begins)):
        nohit, hit = golden.rosetta_obstacle_ray(tuple(begins[i]), tuple(ends[i]), size)
        want = [y * size + x for x, y in nohit]
        got = flat[i][mask[i]].tolist()
        assert got == want, (begins[i], ends[i], got[:5], want[:5])
        if hit is None:
            assert not bool(end_ok[i])
        else:
            assert bool(end_ok[i])
            assert int(end_flat[i]) == hit[1] * size + hit[0]


def test_clip_ray_matches_reference():
    size = 64
    rng = np.random.default_rng(2)
    starts = rng.integers(0, size, (200, 2))
    ends = rng.integers(-80, size + 80, (200, 2))
    x2c, y2c, ok = rz.clip_ray_endpoint(
        jnp.asarray(starts[:, 0], jnp.int32), jnp.asarray(starts[:, 1], jnp.int32),
        jnp.asarray(ends[:, 0], jnp.int32), jnp.asarray(ends[:, 1], jnp.int32), size)
    for i in range(200):
        ok1, xa, ya = golden.clip_ray(size, int(ends[i, 0]), int(ends[i, 1]),
                                      int(starts[i, 0]), int(starts[i, 1]))
        if ok1:
            ok2, yb, xb = golden.clip_ray(size, ya, xa, int(starts[i, 1]),
                                          int(starts[i, 0]))
        want_ok = ok1 and ok2
        assert bool(ok[i]) == want_ok, i
        if want_ok:
            assert (int(x2c[i]), int(y2c[i])) == (xb, yb), i


def test_hole_ray_cells_vs_golden():
    size = 64
    no_obs, value = 65500, 0
    rng = np.random.default_rng(3)
    x1, y1 = 30, 28
    n = 400
    # hit points around the robot; extended endpoints a bit past them (HoleWidth),
    # including off-map overshoots
    ang = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(1.0, 60.0, n)
    xp = (x1 + r * np.cos(ang)).astype(int)
    yp = (y1 + r * np.sin(ang)).astype(int)
    ext = rng.uniform(1.0, 1.4, n)
    x2 = (x1 + r * ext * np.cos(ang)).astype(int)
    y2 = (y1 + r * ext * np.sin(ang)).astype(int)

    out = rz.hole_ray_cells(x1, y1, jnp.asarray(x2, jnp.int32),
                            jnp.asarray(y2, jnp.int32), jnp.asarray(xp, jnp.int32),
                            jnp.asarray(yp, jnp.int32), value, no_obs, size,
                            max_steps=size + 1)
    flat = np.asarray(out.flat)
    pixval = np.asarray(out.pixval)
    mask = np.asarray(out.mask)
    for i in range(n):
        want = golden.hole_ray_draw(x1, y1, int(x2[i]), int(y2[i]), int(xp[i]),
                                    int(yp[i]), value, no_obs, size)
        got = list(zip(flat[i][mask[i]].tolist(), pixval[i][mask[i]].tolist()))
        assert got == want, (i, x2[i], y2[i], xp[i], yp[i], got[:4], want[:4])


def test_hole_ray_general_value_profile():
    # exercise the error-accumulator terms with a value ABOVE no_obstacle
    # (sincv=+1, positive incerrorv) — the branch the scan never uses but the
    # closed form must still match.
    size = 48
    no_obs, value = 100, 3000
    x1, y1 = 20, 20
    rng = np.random.default_rng(4)
    for trial in range(200):
        x2 = int(rng.integers(0, size))
        y2 = int(rng.integers(0, size))
        xp = (x1 + x2) // 2 + int(rng.integers(-3, 4))
        yp = (y1 + y2) // 2 + int(rng.integers(-3, 4))
        out = rz.hole_ray_cells(x1, y1, jnp.asarray([x2], jnp.int32),
                                jnp.asarray([y2], jnp.int32),
                                jnp.asarray([xp], jnp.int32),
                                jnp.asarray([yp], jnp.int32),
                                value, no_obs, size, max_steps=size + 1)
        want = golden.hole_ray_draw(x1, y1, x2, y2, xp, yp, value, no_obs, size)
        got = list(zip(np.asarray(out.flat)[0][np.asarray(out.mask)[0]].tolist(),
                       np.asarray(out.pixval)[0][np.asarray(out.mask)[0]].tolist()))
        assert got == want, (trial, x2, y2, xp, yp, got[:5], want[:5])
