"""Simulated lidar: fixed-width noisy scans from the polygon field.

Reproduces MainWindow.ScanSegments (Simulation/MainWindow.xaml.cs:380-407):
400 evenly spaced angles per revolution, ray-traced at the REAL pose, uniform noise
of +/- measure_error meters, misses dropped (here: masked).  The reference
accumulates the scan angle in float32 (``for (float angle = 0; angle < 2pi; angle +=
step)``), which we emulate exactly at setup time so the angle set (and count) matches.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scan import Scan, SegmentScan
from . import field as field_mod


def revolution_angles(num_scan_points: int) -> np.ndarray:
    """Reference angle set: f32 accumulation until >= 2*pi (MainWindow.xaml.cs:391)."""
    step = np.float32(2.0 * math.pi) / np.float32(num_scan_points)
    out = []
    a = np.float32(0.0)
    two_pi = np.float32(2.0 * math.pi)
    while a < two_pi:
        out.append(a)
        a = np.float32(a + step)
    return np.asarray(out, np.float32)


def scan_revolution(fld: field_mod.Field, real_pose, angles, max_dist: float,
                    measure_error: float, key, dropout_prob: float = 0.0,
                    range_error_std: float = 0.0) -> tuple[jnp.ndarray,
                                                           jnp.ndarray]:
    """One revolution at `real_pose`; returns (radii f32[R], valid bool[R]).

    Noise model of MainWindow.xaml.cs:397: ``hit += (rnd.Next(-100,100)/100) * err``
    — i.e. uniform on the discrete grid {-1.00, -0.99, ..., 0.99} * err.

    Fault injection (SURVEY.md §5.3): `dropout_prob` randomly invalidates rays
    (sensor dropouts); `range_error_std` adds gaussian range error — the
    reference's declared-but-unused Field.RayTraceError (Field.cs:36) made real.
    """
    real_pose = jnp.asarray(real_pose, jnp.float32)
    lidar_angles = jnp.asarray(angles) + real_pose[2]
    hit, dist = field_mod.ray_cast(fld, real_pose[:2], lidar_angles, max_dist)
    k1, k2, k3 = jax.random.split(key, 3)
    steps = jax.random.randint(k1, dist.shape, -100, 100)
    noise = steps.astype(jnp.float32) / 100.0 * measure_error
    if range_error_std > 0.0:
        noise = noise + jax.random.normal(k2, dist.shape) * range_error_std
    valid = hit
    if dropout_prob > 0.0:
        valid = valid & (jax.random.uniform(k3, dist.shape) >= dropout_prob)
    return jnp.where(valid, dist + noise, 0.0), valid


def make_segment_scan(angles, radii, valid, odometry_pose) -> SegmentScan:
    """Package a revolution as a single-segment scan tagged with the odometry pose
    (the simulator tags segments with the *estimated* pose — MainWindow.xaml.cs:387)."""
    return SegmentScan.single(angles, radii, valid, odometry_pose)


def make_cloud(angles, radii, valid) -> Scan:
    """Robot-local cartesian cloud for Hector (MainWindow.xaml.cs:167-177)."""
    a = jnp.asarray(angles, jnp.float32)
    r = jnp.asarray(radii, jnp.float32)
    pts = jnp.stack([r * jnp.cos(a), r * jnp.sin(a)], axis=-1)
    return Scan(pts, jnp.asarray(valid), jnp.zeros(3, jnp.float32))
