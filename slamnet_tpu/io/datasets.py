"""Standard 2D lidar dataset ingestion — CARMEN log format (Radish corpus).

The reference consumes arbitrary ``ScanSegment`` streams from real robots
(CoreSLAMProcessor.cs:717; README.md:9 — a competition robot, not a
simulator); the north star requires running on "standard 2D lidar datasets".
CARMEN logs (the Radish repository's interchange format: intel.clf, fr079,
aces, mit-killian, ...) are the classic source, so this module reads them into
the framework's fixed-shape arrays:

  FLASER n r_1..r_n  laser_x laser_y laser_th  odom_x odom_y odom_th  ts host log_ts
  ROBOTLASER1 type start fov res maxr acc rem  n r_1..r_n  m [rem..]
              laser_x laser_y laser_th robot_x robot_y robot_th  tv rv ... ts host log_ts
  ODOM x y th tv rv accel ts host log_ts          (kept for completeness)

Conventions (matching the CARMEN logger): FLASER beams span a 180-degree
field of view, beam i at angle -pi/2 + i * pi/(n-1) in the laser frame; range
values at/above the max-range sentinel (SICK default 81.9 m) are misses.
ROBOTLASER1 carries its geometry explicitly.  All scans in one log must share
a beam count (fixed shapes; true for every Radish log).

``write_carmen`` emits the same format — used to produce the checked-in sample
(examples/data/) from the simulator and for round-trip tests.
"""
from __future__ import annotations

import math
from typing import List, NamedTuple, Tuple

import numpy as np

SICK_MAX_RANGE = 81.9


class LidarLog(NamedTuple):
    """A fixed-shape 2D lidar log: T scans of N beams with odometry poses."""

    ranges: np.ndarray     # f32[T, N] meters
    valid: np.ndarray      # bool[T, N] (False = miss/out-of-range)
    odometry: np.ndarray   # f32[T, 3] laser pose from odometry (x, y, theta)
    angles: np.ndarray     # f32[N] beam angles in the laser frame
    max_range: float
    timestamps: np.ndarray  # f64[T] (0 when the log carries none)
    # ground-truth poses f32[T, 3] when the log carries "# TRUTH x y th"
    # comment lines (simulator-generated logs); None for real-robot logs
    truth: np.ndarray | None = None


def _flaser_angles(n: int, fov: float = math.pi) -> np.ndarray:
    if n == 1:
        return np.zeros(1, np.float32)
    return (-fov / 2.0 + np.arange(n) * (fov / (n - 1))).astype(np.float32)


def read_carmen(path: str, max_range: float | None = None,
                max_scans: int | None = None) -> LidarLog:
    """Parse a CARMEN log file's FLASER/ROBOTLASER1 scans into a LidarLog."""
    ranges: List[np.ndarray] = []
    odom: List[Tuple[float, float, float]] = []
    stamps: List[float] = []
    truth: List[Tuple[float, float, float]] = []
    angles: np.ndarray | None = None
    file_maxr = None

    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0].startswith("#"):
                # "# TRUTH x y th" — ground truth for the NEXT scan line
                # (ignored by standard CARMEN tools; written by write_carmen)
                if len(tok) >= 5 and tok[1] == "TRUTH":
                    truth.append((float(tok[2]), float(tok[3]),
                                  float(tok[4])))
                continue
            if tok[0] == "PARAM" and len(tok) >= 3 and (
                    "maxrange" in tok[1] or tok[1].endswith("laser_max")):
                # CARMEN PARAM line carrying the laser max range (written by
                # write_carmen; present in real Radish logs as
                # robot_front_laser_max)
                try:
                    file_maxr = float(tok[2])
                except ValueError:
                    pass
                continue
            if tok[0] == "FLASER":
                n = int(tok[1])
                r = np.asarray(tok[2:2 + n], np.float32)
                lx, ly, lth = (float(tok[2 + n]), float(tok[3 + n]),
                               float(tok[4 + n]))
                ts = float(tok[8 + n]) if len(tok) > 8 + n else 0.0
                if angles is None:
                    angles = _flaser_angles(n)
                elif len(angles) != n:
                    raise ValueError(
                        f"mixed beam counts in {path}: {len(angles)} vs {n}")
                ranges.append(r)
                odom.append((lx, ly, lth))
                stamps.append(ts)
            elif tok[0] == "ROBOTLASER1":
                start = float(tok[2])
                res = float(tok[4])
                maxr = float(tok[5])
                n = int(tok[8])
                r = np.asarray(tok[9:9 + n], np.float32)
                m = int(tok[9 + n])
                base = 10 + n + m
                lx, ly, lth = (float(tok[base]), float(tok[base + 1]),
                               float(tok[base + 2]))
                ts = float(tok[base + 11]) if len(tok) > base + 11 else 0.0
                a = (start + np.arange(n) * res).astype(np.float32)
                if angles is None:
                    angles = a
                elif len(angles) != n:
                    raise ValueError(
                        f"mixed beam counts in {path}: {len(angles)} vs {n}")
                file_maxr = maxr
                ranges.append(r)
                odom.append((lx, ly, lth))
                stamps.append(ts)
            if max_scans is not None and len(ranges) >= max_scans:
                break

    if not ranges:
        raise ValueError(f"no FLASER/ROBOTLASER1 lines in {path}")
    if max_range is None:
        max_range = file_maxr if file_maxr is not None else SICK_MAX_RANGE
    rr = np.stack(ranges)
    valid = (rr > 0.0) & (rr < 0.99 * max_range)
    return LidarLog(ranges=rr, valid=valid,
                    odometry=np.asarray(odom, np.float32),
                    angles=angles, max_range=float(max_range),
                    timestamps=np.asarray(stamps, np.float64),
                    truth=(np.asarray(truth, np.float32)
                           if len(truth) == len(ranges) else None))


def write_carmen(path: str, log: LidarLog, host: str = "slamnet") -> None:
    """Emit a LidarLog as CARMEN FLASER lines (invalid beams -> max_range)."""
    with open(path, "w") as f:
        f.write("# CARMEN log written by slamnet_tpu.io.datasets\n")
        f.write("# robot: simulated (slamnet_tpu.sim)\n")
        f.write(f"PARAM robot_frontlaser_maxrange {log.max_range:.6f}\n")
        for t in range(log.ranges.shape[0]):
            r = np.where(log.valid[t], log.ranges[t], log.max_range)
            vals = " ".join(f"{v:.3f}" for v in r)
            x, y, th = log.odometry[t]
            ts = log.timestamps[t] if log.timestamps.size else 0.0
            if log.truth is not None:
                tx, ty, tth = log.truth[t]
                f.write(f"# TRUTH {tx:.6f} {ty:.6f} {tth:.6f}\n")
            f.write(f"FLASER {log.ranges.shape[1]} {vals} "
                    f"{x:.6f} {y:.6f} {th:.6f} {x:.6f} {y:.6f} {th:.6f} "
                    f"{ts:.6f} {host} {ts:.6f}\n")


def log_points(log: LidarLog) -> np.ndarray:
    """Cartesian points f32[T, N, 2] in the laser frame (mask with log.valid)."""
    c = np.cos(log.angles)[None, :]
    s = np.sin(log.angles)[None, :]
    return np.stack([log.ranges * c, log.ranges * s], -1).astype(np.float32)


def simulate_carmen_log(n_scans: int = 120, num_beams: int = 180,
                        speed: float = 0.25, odom_noise: float = 0.01,
                        seed: int = 0) -> LidarLog:
    """Generate a CARMEN-convention log from the built-in simulator: 180-beam
    front-facing scans over the default 40x40 m field with noisy integrated
    odometry — the checked-in sample's generator (scripts/make_sample_carmen.py)."""
    import jax
    import jax.numpy as jnp

    from ..core import SimConfig
    from ..sim import default_field, lidar
    from ..sim.trajectory import loop_trajectory

    sim = SimConfig()
    fld = default_field()
    angles = _flaser_angles(num_beams)
    traj = np.asarray(loop_trajectory(speed=speed)[:n_scans])

    @jax.jit
    def gen(poses, key):
        keys = jax.random.split(key, poses.shape[0])

        def one(p, k):
            return lidar.scan_revolution(fld, p, jnp.asarray(angles),
                                         sim.max_scan_dist, sim.measure_error,
                                         k)
        return jax.vmap(one)(poses, keys)

    radii, valid = gen(jnp.asarray(traj), jax.random.PRNGKey(seed))

    rng = np.random.default_rng(seed)
    odo = traj.copy()
    drift = np.cumsum(rng.normal(0, odom_noise, (n_scans, 3)), axis=0)
    drift[:, 2] *= 0.3
    odo = odo + drift.astype(np.float32)
    return LidarLog(ranges=np.asarray(radii), valid=np.asarray(valid),
                    odometry=odo.astype(np.float32), angles=angles,
                    max_range=sim.max_scan_dist,
                    timestamps=(np.arange(n_scans) / sim.scans_per_second))


def drifting_odometry(traj, scale_bias: float = 1.02,
                      heading_bias: float = 0.0002,
                      step_noise: float = 0.003,
                      lat_noise: float | None = None,
                      heading_noise: float = 0.001,
                      seed: int = 7) -> np.ndarray:
    """Integrate wheel-odometry-style drift along a true trajectory.

    The same error model as simulate_adversarial_log's odometry (translation
    scale bias, per-step heading bias, gaussian step noise, integrated in
    the accumulated odometry frame) as a standalone helper, so any simulated
    world/trajectory can get a realistic odometry prior (the office-world
    loop-closure bench, scripts/bench_office_graph.py).  No slip events —
    add those by perturbing the returned track if needed.

    Returns odo f32[T, 3] with odo[0] == traj[0].
    """
    traj = np.asarray(traj, np.float64)
    if lat_noise is None:
        lat_noise = 0.4 * step_noise
    rng = np.random.default_rng(seed)
    odo = np.zeros_like(traj)
    odo[0] = traj[0]
    for t in range(1, traj.shape[0]):
        d_world = traj[t] - traj[t - 1]
        c, s = math.cos(traj[t - 1, 2]), math.sin(traj[t - 1, 2])
        fwd = c * d_world[0] + s * d_world[1]
        lat = -s * d_world[0] + c * d_world[1]
        dth = math.remainder(d_world[2], 2.0 * math.pi)
        fwd = fwd * scale_bias + rng.normal(0, step_noise)
        lat = lat * scale_bias + rng.normal(0, lat_noise)
        dth = dth + heading_bias + rng.normal(0, heading_noise)
        co, so = math.cos(odo[t - 1, 2]), math.sin(odo[t - 1, 2])
        odo[t, 0] = odo[t - 1, 0] + co * fwd - so * lat
        odo[t, 1] = odo[t - 1, 1] + so * fwd + co * lat
        odo[t, 2] = odo[t - 1, 2] + dth
    return odo.astype(np.float32)


def simulate_adversarial_log(n_scans: int = 360, num_beams: int = 181,
                             speed: float = 0.3, dropout_prob: float = 0.2,
                             range_error_std: float = 0.03,
                             odom_scale_bias: float = 1.03,
                             odom_heading_bias: float = 0.0008,
                             odom_step_noise: float = 0.004,
                             num_slips: int = 3,
                             seed: int = 11,
                             trajectory=None) -> LidarLog:
    """A "realistic adversarial" CARMEN log (VERDICT r03 item 5): the failure
    modes of real sensor logs (Radish intel.clf / fr079 class), which the
    clean simulator bench never exercises:

      * 180-degree front-facing FoV (181 beams, SICK convention) — half the
        view of the bench's 360-degree revolutions, so the matcher works
        with one-sided evidence and corridor views are genuinely degenerate;
      * `dropout_prob` beam dropouts (absorptive surfaces / specular misses)
        on top of the field's geometric misses;
      * gaussian range error (`range_error_std`, default 3 cm ~ SICK spec)
        beyond the reference's +/-2 cm uniform noise;
      * SYSTEMATIC odometry error, integrated step-by-step in the robot
        frame the way wheel odometry actually drifts: translation scale bias
        (`odom_scale_bias`, e.g. tire diameter error), per-step heading bias
        (`odom_heading_bias`, differential calibration), gaussian step noise,
        plus `num_slips` discrete slip events (0.15-0.4 m + 3-8 deg kicks —
        wheel slip / collision), so the odometry prior is wrong exactly when
        a robust pipeline must recover from it.

    Ground truth rides along in the log as "# TRUTH" comment lines
    (write_carmen/read_carmen), so replays can report real ATE.
    """
    import jax
    import jax.numpy as jnp

    from ..core import SimConfig
    from ..sim import default_field, lidar
    from ..sim.trajectory import loop_trajectory

    sim = SimConfig()
    fld = default_field()
    angles = _flaser_angles(num_beams)
    if trajectory is None:
        trajectory = loop_trajectory(speed=speed)
    traj = np.asarray(trajectory[:n_scans], np.float64)
    if traj.shape[0] < n_scans:
        raise ValueError(f"trajectory too short: {traj.shape[0]} < {n_scans}")

    @jax.jit
    def gen(poses, key):
        keys = jax.random.split(key, poses.shape[0])

        def one(p, k):
            return lidar.scan_revolution(
                fld, p, jnp.asarray(angles), sim.max_scan_dist,
                sim.measure_error, k, dropout_prob=dropout_prob,
                range_error_std=range_error_std)
        return jax.vmap(one)(poses, keys)

    radii, valid = gen(jnp.asarray(traj, jnp.float32),
                       jax.random.PRNGKey(seed))

    # integrate odometry in the robot frame with systematic error
    rng = np.random.default_rng(seed)
    first_slip = min(10, max(1, n_scans - 1))
    n_slips = min(num_slips, max(0, n_scans - first_slip))
    slip_steps = rng.choice(np.arange(first_slip, n_scans), size=n_slips,
                            replace=False)
    odo = np.zeros_like(traj)
    odo[0] = traj[0]
    for t in range(1, n_scans):
        # true per-step delta in the previous TRUE robot frame
        d_world = traj[t] - traj[t - 1]
        c, s = math.cos(traj[t - 1, 2]), math.sin(traj[t - 1, 2])
        fwd = c * d_world[0] + s * d_world[1]
        lat = -s * d_world[0] + c * d_world[1]
        dth = math.remainder(d_world[2], 2.0 * math.pi)
        # odometry measures the delta with bias + noise (+ slip kicks)
        fwd = fwd * odom_scale_bias + rng.normal(0, odom_step_noise)
        lat = lat * odom_scale_bias + rng.normal(0, odom_step_noise * 0.3)
        dth = dth + odom_heading_bias + rng.normal(0, odom_step_noise * 0.5)
        if t in slip_steps:
            fwd += rng.uniform(0.15, 0.4) * rng.choice([-1.0, 1.0])
            dth += math.radians(rng.uniform(3.0, 8.0)) * rng.choice([-1.0, 1.0])
        # re-integrate in the accumulated ODOMETRY frame
        co, so = math.cos(odo[t - 1, 2]), math.sin(odo[t - 1, 2])
        odo[t, 0] = odo[t - 1, 0] + co * fwd - so * lat
        odo[t, 1] = odo[t - 1, 1] + so * fwd + co * lat
        odo[t, 2] = odo[t - 1, 2] + dth

    return LidarLog(ranges=np.asarray(radii), valid=np.asarray(valid),
                    odometry=odo.astype(np.float32), angles=angles,
                    max_range=sim.max_scan_dist,
                    timestamps=(np.arange(n_scans) / sim.scans_per_second),
                    truth=traj.astype(np.float32))
