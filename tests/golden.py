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
