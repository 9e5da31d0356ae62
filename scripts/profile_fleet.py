#!/usr/bin/env python
"""Where does the fleet batch-scan go?  Phase breakdown on the real chip:

  a) match-only (gates forced shut via huge thresholds)
  b) full pipeline (line-mode updates)
  c) full pipeline (dense polar fill updates)
  d) full pipeline (Pallas dense fill) — when available

Usage: python scripts/profile_fleet.py [--batch 64] [--scans 64]
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--scans", type=int, default=64)
    ap.add_argument("--subsample", type=int, default=1,
                    help="matcher beam subsample (bench_fleet uses 4)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from slamnet_tpu.core import HectorConfig, SimConfig
    from slamnet_tpu.models import fleet
    from slamnet_tpu.sim import default_field, lidar
    from slamnet_tpu.sim.trajectory import loop_trajectory

    cfg = HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4),
                       xy_step_clamp_px=10.0, match_subsample=args.subsample)
    sim = SimConfig()
    B, T = args.batch, args.scans
    boot = 10

    cpu = jax.devices("cpu")[0]
    fld = default_field()
    angles_np = lidar.revolution_angles(sim.num_scan_points)
    full = loop_trajectory(speed=0.3)
    starts = np.linspace(0, len(full) - (T + boot), B).astype(int)
    traj = np.stack([full[s:s + T + boot] for s in starts])

    with jax.default_device(cpu):
        fld_c = jax.tree.map(lambda x: jax.device_put(x, cpu), fld)
        angles_c = jax.device_put(jnp.asarray(angles_np), cpu)

        @jax.jit
        def genlog(poses, key):
            keys = jax.random.split(key, poses.shape[0])

            def one(p, k):
                return lidar.scan_revolution(fld_c, p, angles_c,
                                             sim.max_scan_dist,
                                             sim.measure_error, k)
            return jax.vmap(one)(poses, keys)

        flat = traj.reshape(-1, 3)
        radii_c, valid_c = genlog(jax.device_put(jnp.asarray(flat), cpu),
                                  jax.device_put(jax.random.PRNGKey(0), cpu))
    radii = np.asarray(radii_c).reshape(B, T + boot, -1).transpose(1, 0, 2)
    valids = np.asarray(valid_c).reshape(B, T + boot, -1).transpose(1, 0, 2)

    dev = jax.devices()[0]
    radii = jax.device_put(radii, dev)
    valids = jax.device_put(valids, dev)
    angles = jax.device_put(jnp.asarray(angles_np), dev)
    traj_d = jax.device_put(jnp.asarray(traj.transpose(1, 0, 2)), dev)

    base_states = fleet.init_fleet(cfg, traj[:, 0])

    @jax.jit
    def boot_step(states, r, v, poses):
        pts = jnp.stack([r * jnp.cos(angles)[None], r * jnp.sin(angles)[None]],
                        -1)
        states = states._replace(match_pose=poses)
        states, _ = fleet.update_fleet(states, pts, v, cfg,
                                       map_without_matching=True)
        return states

    states = base_states
    for t in range(boot):
        states = boot_step(states, radii[t], valids[t], traj_d[t])
    jax.block_until_ready(states)

    def timed(name, cfg_x):
        replay = jax.jit(
            lambda s, r, v: fleet.replay_fleet(s, r, v, angles, cfg_x))
        stf, _ = replay(states, radii[boot:], valids[boot:])
        jax.block_until_ready(stf)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            stf, _ = replay(states, radii[boot:], valids[boot:])
            jax.block_until_ready(stf)
            best = min(best, time.time() - t0)
        print(f"{name:32s} {best / T * 1e3:8.2f} ms/batch-scan  "
              f"{T * B / best:8.0f} inst-scans/s")

    timed("match-only (gates shut)",
          dataclasses.replace(cfg, min_distance_diff_for_map_update=1e9,
                              min_angle_diff_for_map_update=1e9))
    timed("full, line updates", cfg)
    timed("full, dense fill", dataclasses.replace(cfg, dense_free_fill=True))
    timed("match-only + early-exit",
          dataclasses.replace(cfg, min_distance_diff_for_map_update=1e9,
                              min_angle_diff_for_map_update=1e9,
                              early_exit_tol=1e-3))
    timed("full, line + early-exit",
          dataclasses.replace(cfg, early_exit_tol=1e-3))


if __name__ == "__main__":
    main()
