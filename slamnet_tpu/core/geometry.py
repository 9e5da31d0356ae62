"""Angle and pose math (jnp, pure functions).

Reproduces the numerical contracts of the reference's BaseSLAM/MathEx.cs and
BaseSLAM/VectorEx.cs, as documented in SURVEY.md §2.1.  Everything here works on
scalars or batched arrays and is safe under jit/vmap.

Poses are ``f32[..., 3]`` arrays ``(x, y, theta)`` — x/y in meters (or map pixels where
stated), theta in radians.
"""
from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def deg_to_rad(deg):
    """Degrees to radians (MathEx.DegToRad, BaseSLAM/MathEx.cs:45-48)."""
    return jnp.asarray(deg) * (jnp.pi / 180.0)


def rad_to_deg(rad):
    """Radians to degrees (MathEx.RadToDeg, BaseSLAM/MathEx.cs:56-59)."""
    return jnp.asarray(rad) * (180.0 / jnp.pi)


def normalize_angle_pos(angle):
    """Wrap angle to [0, 2*pi) (MathEx.NormalizeAnglePos, BaseSLAM/MathEx.cs:116-121)."""
    return jnp.mod(jnp.mod(angle, TWO_PI) + TWO_PI, TWO_PI)


def normalize_angle(angle):
    """Wrap angle to (-pi, pi] (MathEx.NormalizeAngle, BaseSLAM/MathEx.cs:128-138)."""
    a = normalize_angle_pos(angle)
    return jnp.where(a > jnp.pi, a - TWO_PI, a)


def rad_diff(a, b):
    """Signed smallest difference a-b between two angles in radians.

    (MathEx.RadDiff, BaseSLAM/MathEx.cs:94-98.)
    """
    d = ((a - b) + jnp.pi) / TWO_PI
    return (d - jnp.floor(d)) * TWO_PI - jnp.pi


def deg_diff(a, b):
    """Signed smallest difference a-b between two angles in degrees.

    (MathEx.DegDiff float overload, BaseSLAM/MathEx.cs:69-73.)  Kept for the
    documented reference quirk where HectorSLAMProcessor.cs:108 calls this on
    radian values (see models/hector.py `angle_gate_compat`).
    """
    d = ((a - b) + 180.0) / 360.0
    return (d - jnp.floor(d)) * 360.0 - 180.0


def polar_to_cartesian(radius, angle):
    """Polar to cartesian, stacked on the last axis (MathEx.PolarToCartesian,
    BaseSLAM/MathEx.cs:147-152)."""
    return jnp.stack([radius * jnp.cos(angle), radius * jnp.sin(angle)], axis=-1)


def rot2(theta):
    """2x2 rotation matrix (stacked as [..., 2, 2]) for CCW rotation by theta."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def transform_points(points, pose):
    """Rigid-transform robot-local points into the frame of `pose`.

    points: f32[..., N, 2]; pose: f32[..., 3].  Returns f32[..., N, 2]:
    ``R(theta) @ p + (x, y)``.
    """
    r = rot2(pose[..., 2])
    return jnp.einsum("...ij,...nj->...ni", r, points) + pose[..., None, :2]


def pose_compose(a, b):
    """SE(2) composition a ⊕ b: apply b in the frame of a.

    Returns (a.xy + R(a.th) @ b.xy, a.th + b.th).  Used by the pose-graph layer.
    """
    r = rot2(a[..., 2])
    xy = a[..., :2] + jnp.einsum("...ij,...j->...i", r, b[..., :2])
    th = a[..., 2] + b[..., 2]
    return jnp.concatenate([xy, th[..., None]], axis=-1)


def pose_inverse(a):
    """SE(2) inverse: a ⊕ inverse(a) = identity."""
    r = rot2(-a[..., 2])
    xy = -jnp.einsum("...ij,...j->...i", r, a[..., :2])
    return jnp.concatenate([xy, -a[..., 2:3]], axis=-1)


def pose_between(a, b):
    """Relative pose from a to b: inverse(a) ⊕ b (b expressed in a's frame)."""
    return pose_compose(pose_inverse(a), b)


def limit(x, lo, hi):
    """Clamp (MathEx.Limit float/int overloads, BaseSLAM/MathEx.cs:21-36)."""
    return jnp.clip(x, lo, hi)


def find_position_on_line(p, a, b):
    """Project point p onto the infinite line through a-b
    (VectorEx.FindPositionOnLine, BaseSLAM/VectorEx.cs:35-46)."""
    p = jnp.asarray(p, jnp.float32)
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1, keepdims=True), 1e-12)
    t = jnp.sum((p - a) * ab, axis=-1, keepdims=True) / denom
    return a + t * ab


def point_to_line_distance(p, a, b):
    """Distance from p to the infinite line through a-b
    (VectorEx.PointToLine, BaseSLAM/VectorEx.cs:55-61)."""
    proj = find_position_on_line(p, a, b)
    return jnp.linalg.norm(jnp.asarray(p, jnp.float32) - proj, axis=-1)


def csharp_trunc(x):
    """C# (int) cast semantics: truncate toward zero.

    The reference converts float map coordinates to ints with a plain cast
    (e.g. CoreSLAMProcessor.cs:240-241 ``(int)(px + c*X - s*Y)``), which truncates
    toward zero — NOT floor.  Coordinates in (-1, 0) therefore land on pixel 0 and
    pass the ``>= 0`` bounds check, exactly as in the reference.
    """
    return jnp.trunc(x).astype(jnp.int32)


def dotnet_round(x):
    """.NET MathF.Round semantics: round half to even (banker's rounding).

    Used by VectorEx.ToRoundPoint (BaseSLAM/VectorEx.cs) when Hector rounds beam
    endpoints to map pixels (OccGridMap.cs:127,134).  jnp.round implements
    round-half-to-even, matching .NET's default MidpointRounding.ToEven.
    """
    return jnp.round(x).astype(jnp.int32)
