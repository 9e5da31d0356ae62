"""Sequential numpy goldens reproducing the reference's per-cell algorithms.

These are straight re-implementations of the C# recurrences (cited per function),
used ONLY to validate the closed-form vectorized kernels in slamnet_tpu.ops — they
are the "tiny hand-computed cases" strategy of SURVEY.md §4 scaled up to exhaustive
random cross-checks.  Kept deliberately dumb and step-by-step.
"""
from __future__ import annotations

import math

import numpy as np


def csharp_div(a: int, b: int) -> int:
    """C# integer division truncates toward zero."""
    return int(math.trunc(a / b))


def hector_bresenham_free_cells(begin, end, width):
    """Free-cell sequence of OccGridMap.UpdateLineBresenhami/Bresenham2D
    (OccGridMap.cs:155-239).  Returns list of flat offsets (endpoint excluded)."""
    bx, by = begin
    ex, ey = end
    dx, dy = ex - bx, ey - by
    abs_dx, abs_dy = abs(dx), abs(dy)
    offset_dx = int(np.sign(dx))
    offset_dy = int(np.sign(dy)) * width
    start_offset = by * width + bx
    if abs_dx >= abs_dy:
        abs_da, abs_db, error_b = abs_dx, abs_dy, abs_dx // 2
        offset_a, offset_b = offset_dx, offset_dy
    else:
        abs_da, abs_db, error_b = abs_dy, abs_dx, abs_dy // 2
        offset_a, offset_b = offset_dy, offset_dx
    cells = [start_offset]
    offset = start_offset
    for _ in range(abs_da - 1):
        offset += offset_a
        error_b += abs_db
        if error_b >= abs_da:
            offset += offset_b
            error_b -= abs_da
        cells.append(offset)
    return cells


def rosetta_obstacle_ray(begin, end, size):
    """DrawLaserRayOnObstacleMap walk (CoreSLAMProcessor.cs:456-490).

    Returns (nohit_cells [(x,y)...], hit_cell or None)."""
    x1, y1 = begin
    x2, y2 = end
    dx, sx = abs(x2 - x1), int(np.sign(x2 - x1))
    dy, sy = abs(y2 - y1), int(np.sign(y2 - y1))
    err = csharp_div(dx if dx > dy else -dy, 2)
    nohit = []
    while True:
        if x1 < 0 or x1 >= size or y1 < 0 or y1 >= size:
            return nohit, None
        if x1 == x2 and y1 == y2:
            return nohit, (x1, y1)
        nohit.append((x1, y1))
        e2 = err
        if e2 > -dx:
            err -= dy
            x1 += sx
        if e2 < dy:
            err += dx
            y1 += sy


def clip_ray(size, xyc, yxc, xy, yx):
    """CoreSLAM ClipRay (CoreSLAMProcessor.cs:320-345). Returns (ok, xyc, yxc)."""
    if xyc < 0:
        if xyc == xy:
            return False, xyc, yxc
        yxc += csharp_div((yxc - yx) * (-xyc), (xyc - xy))
        xyc = 0
    if xyc >= size:
        if xyc == xy:
            return False, xyc, yxc
        yxc += csharp_div((yxc - yx) * (size - 1 - xyc), (xyc - xy))
        xyc = size - 1
    return True, xyc, yxc


def hole_ray_draw(x1, y1, x2, y2, xp, yp, value, no_obstacle, size):
    """DrawLaserRayOnHoleMap traversal + V-profile (CoreSLAMProcessor.cs:359-443).

    Returns list of (flat_ptr, pixval) in draw order; [] if the beam bails."""
    ok, x2c, y2c = clip_ray(size, x2, y2, x1, y1)
    if not ok:
        return []
    ok, y2c, x2c = clip_ray(size, y2c, x2c, y1, x1)
    if not ok:
        return []

    dx, dy = abs(x2 - x1), abs(y2 - y1)
    dxc, dyc = abs(x2c - x1), abs(y2c - y1)
    incptrx = int(np.sign(x2 - x1))
    incptry = int(np.sign(y2 - y1)) * size
    sincv = int(np.sign(value - no_obstacle))
    if dx > dy:
        derrorv = abs(xp - x2)
    else:
        dx, _ = dy, dx
        dxc, dyc = dyc, dxc
        incptrx, incptry = incptry, incptrx
        derrorv = abs(yp - y2)
    if derrorv == 0:
        return []

    error = 2 * dyc - dxc
    horiz = 2 * dyc
    diago = 2 * (dyc - dxc)
    errorv = derrorv // 2
    incv = csharp_div(value - no_obstacle, derrorv)
    incerrorv = value - no_obstacle - derrorv * incv

    ptr = y1 * size + x1
    pixval = no_obstacle
    out = []
    for x in range(dxc + 1):
        if x > dx - 2 * derrorv:
            if x <= dx - derrorv:
                pixval += incv
                errorv += incerrorv
                if errorv > derrorv:
                    pixval += sincv
                    errorv -= derrorv
            else:
                pixval -= incv
                errorv -= incerrorv
                if errorv < 0:
                    pixval -= sincv
                    errorv += derrorv
        out.append((ptr, pixval))
        if error > 0:
            ptr += incptry
            error += diago
        else:
            error += horiz
        ptr += incptrx
    return out


def hole_map_blend(pixels, draws, alpha):
    """Sequential alpha blend (CoreSLAMProcessor.cs:431) over a draw list."""
    for ptr, pixval in draws:
        pixels[ptr] = ((256 - alpha) * int(pixels[ptr]) + alpha * pixval) >> 8
    return pixels


def calculate_distance_batch(points, poses, pixels, size, scale):
    """Vectorized-exact CalculateDistanceSISD over B candidate poses.

    Identical float32 op sequence per point as calculate_distance (the sum of
    int pixels is order-free, so vectorizing cannot change the result);
    returns (sums i64[B], nb i32[B])."""
    px = poses[:, 0].astype(np.float32) * np.float32(scale) + np.float32(0.5)
    py = poses[:, 1].astype(np.float32) * np.float32(scale) + np.float32(0.5)
    c = np.cos(poses[:, 2]).astype(np.float32) * np.float32(scale)
    s = np.sin(poses[:, 2]).astype(np.float32) * np.float32(scale)
    X = points[:, 0].astype(np.float32)[None, :]
    Y = points[:, 1].astype(np.float32)[None, :]
    x = np.trunc(px[:, None] + c[:, None] * X - s[:, None] * Y).astype(np.int64)
    y = np.trunc(py[:, None] + s[:, None] * X + c[:, None] * Y).astype(np.int64)
    in_b = (x >= 0) & (x < size) & (y >= 0) & (y < size)
    flat = np.clip(y * size + x, 0, size * size - 1)
    vals = np.where(in_b, pixels[flat], 0)
    return vals.sum(axis=1), in_b.sum(axis=1).astype(np.int32)


class GoldenCoreSlam:
    """Composed sequential CoreSLAM pipeline oracle (SURVEY.md §7 hard-part 2).

    The full Update() flow of CoreSLAMProcessor.cs:717-752 re-composed from the
    per-kernel goldens above: odometry-delta search prior + warmup (:728,
    :739-743), Monte-Carlo search over `num_candidates` perturbations of the
    FIXED search pose (:624-653 — the reference perturbs searchPose, not the
    running best, so a batch is distributionally identical), exact sequential
    hole-map update (UpdateHoleMap :496-534 endpoint math + DrawLaserRayOnHoleMap
    V-profile + ordered alpha blends).  The obstacle map is skipped — it never
    feeds back into the pose estimate (search scores against the hole map only).
    """

    TS_OBSTACLE = 0
    TS_NO_OBSTACLE = 65500

    def __init__(self, size, scale, start_pose, sigma_xy, sigma_theta,
                 num_candidates, hole_width, quality, warmup, seed=0):
        self.size, self.scale = size, scale
        self.pixels = np.full(size * size,
                              (self.TS_OBSTACLE + self.TS_NO_OBSTACLE) // 2,
                              np.int64)
        self.pose = np.asarray(start_pose, np.float32).copy()
        self.last_odo = np.zeros(3, np.float32)
        self.sigma_xy, self.sigma_theta = sigma_xy, sigma_theta
        self.num_candidates = num_candidates
        self.hole_width, self.quality = hole_width, quality
        self.warmup = warmup
        self.scan_count = 0
        self.rng = np.random.default_rng(seed)

    def _search(self, points, search_pose):
        deltas = np.zeros((self.num_candidates, 3), np.float32)
        deltas[1:, 0] = self.rng.normal(0, self.sigma_xy,
                                        self.num_candidates - 1)
        deltas[1:, 1] = self.rng.normal(0, self.sigma_xy,
                                        self.num_candidates - 1)
        deltas[1:, 2] = self.rng.normal(0, self.sigma_theta,
                                        self.num_candidates - 1)
        cands = search_pose[None, :] + deltas
        sums, nb = calculate_distance_batch(points, cands, self.pixels,
                                            self.size, self.scale)
        eff = np.where(nb > 0, sums, np.int64(2**62))
        return cands[int(np.argmin(eff))]

    def _update_hole_map(self, points):
        """UpdateHoleMap (:496-534): exact float32 endpoint math, per-beam
        sequential draws; within one beam Bresenham visits distinct pixels, so
        each beam's blend list applies as one vectorized read-modify-write."""
        f32 = np.float32
        px = f32(self.pose[0]) * f32(self.scale) + f32(0.5)
        py = f32(self.pose[1]) * f32(self.scale) + f32(0.5)
        c = f32(math.cos(self.pose[2])) * f32(self.scale)
        s = f32(math.sin(self.pose[2])) * f32(self.scale)
        x1, y1 = int(px), int(py)
        if not (0 <= x1 < self.size and 0 <= y1 < self.size):
            return
        for X, Y in points:
            x2p = c * f32(X) - s * f32(Y)
            y2p = s * f32(X) + c * f32(Y)
            xp, yp = int(px + x2p), int(py + y2p)
            dist = f32(math.sqrt(f32(x2p * x2p + y2p * y2p)))
            add = f32(self.hole_width) * f32(self.scale) / f32(2.0) / dist
            x2p = f32(x2p * (f32(1.0) + add))
            y2p = f32(y2p * (f32(1.0) + add))
            x2, y2 = int(px + x2p), int(py + y2p)
            draws = hole_ray_draw(x1, y1, x2, y2, xp, yp, self.TS_OBSTACLE,
                                  self.TS_NO_OBSTACLE, self.size)
            if draws:
                ptrs = np.asarray([d[0] for d in draws])
                vals = np.asarray([d[1] for d in draws], np.int64)
                self.pixels[ptrs] = (
                    (256 - self.quality) * self.pixels[ptrs]
                    + self.quality * vals) >> 8

    def update(self, points, odo):
        """One scan; points = cartesian hits only (valid beams), odo = the
        odometry pose (the simulator feeds the estimate back, MainWindow:380-407)."""
        odo = np.asarray(odo, np.float32)
        if self.scan_count >= self.warmup:
            search_pose = self.pose + (odo - self.last_odo)
            self.pose = self._search(points, search_pose)
        else:
            self.pose = odo.copy()
            self.scan_count += 1
        # MathEx.NormalizeAngle to (-pi, pi] (MathEx.cs:128-138)
        a = self.pose[2] % (2 * math.pi)
        self.pose[2] = np.float32(a - 2 * math.pi if a > math.pi else a)
        self._update_hole_map(points)
        self.last_odo = odo
        return self.pose.copy()


def calculate_distance(points, pose, pixels, size, scale):
    """CalculateDistanceSISD (CoreSLAMProcessor.cs:226-259): (sum, nb, score)."""
    px = np.float32(pose[0]) * np.float32(scale) + np.float32(0.5)
    py = np.float32(pose[1]) * np.float32(scale) + np.float32(0.5)
    c = np.float32(math.cos(pose[2])) * np.float32(scale)
    s = np.float32(math.sin(pose[2])) * np.float32(scale)
    nb, total = 0, 0
    for X, Y in points:
        x = int(np.float32(px + c * np.float32(X) - s * np.float32(Y)))
        y = int(np.float32(py + s * np.float32(X) + c * np.float32(Y)))
        if 0 <= x < size and 0 <= y < size:
            total += int(pixels[y * size + x])
            nb += 1
    if nb > 0:
        return total, nb, (total * 1024) // len(points)
    return total, nb, 2**31 - 1
