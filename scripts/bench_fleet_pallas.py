#!/usr/bin/env python
"""Fleet matcher A/B at serving scale: XLA batched one-hot vs batched Pallas.

Full fleet pipeline (match + gated updates) at B=64 over T-scan phase-shifted
slices of the bench loop log — the exact bench.py fleet workload — comparing
  sub4_onehot  ops/gn.fused_gn_iteration_batch_onehot (XLA, round-3 headline)
  sub4_pallas  ops/pallas_onehot.make_pallas_match_batch (grid over instances,
               per-instance tables VMEM-resident for the whole match)
in ONE process, back to back (docs/PERF.md variance warning).

Usage: python scripts/bench_fleet_pallas.py [--T 256] [--B 64] [--damping 0.0]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=256)
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--damping", type=float, default=0.0)
    ap.add_argument("--match-only", action="store_true",
                    help="also time a matcher-only replay (no map updates)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from slamnet_tpu.core import HectorConfig, SimConfig
    from slamnet_tpu.models import fleet, hector
    from slamnet_tpu.sim import default_field, lidar
    from slamnet_tpu.sim.trajectory import loop_trajectory

    B, T, boot = args.B, args.T, 10
    sim = SimConfig()
    n_total = 522
    cpu = jax.devices("cpu")[0]
    fld = default_field()
    angles_np = lidar.revolution_angles(sim.num_scan_points)
    traj = loop_trajectory(speed=0.3)[:n_total]
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

        radii_c, valids_c = genlog(
            jax.device_put(jnp.asarray(traj), cpu),
            jax.device_put(jax.random.PRNGKey(0), cpu))

    dev = jax.devices()[0]
    radii = jax.device_put(np.asarray(radii_c), dev)
    valids = jax.device_put(np.asarray(valids_c), dev)
    angles = jax.device_put(jnp.asarray(angles_np), dev)

    total = radii.shape[0]
    starts = np.linspace(0, total - (T + boot), B).astype(int)
    r = jnp.stack([radii[s:s + T + boot] for s in starts], axis=1)
    v = jnp.stack([valids[s:s + T + boot] for s in starts], axis=1)
    tr = np.stack([traj[s:s + T + boot] for s in starts], axis=1)
    tr_d = jax.device_put(jnp.asarray(tr), dev)

    base = HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4),
                        xy_step_clamp_px=10.0, max_match_jump=1.0,
                        match_subsample=4, gn_damping=args.damping)

    def run(cfg, label):
        states = fleet.init_fleet(cfg, tr[0])

        @jax.jit
        def boot_step(states, r1, v1, poses):
            pts = jnp.stack([r1 * jnp.cos(angles)[None],
                             r1 * jnp.sin(angles)[None]], -1)
            states = states._replace(match_pose=poses)
            states, _ = fleet.update_fleet(states, pts, v1, cfg,
                                           map_without_matching=True)
            return states

        for t in range(boot):
            states = boot_step(states, r[t], v[t], tr_d[t])
        jax.block_until_ready(states)

        replay = jax.jit(lambda s, rr, vv: fleet.replay_fleet(
            s, rr, vv, angles, cfg))
        stf, poses = replay(states, r[boot:], v[boot:])
        jax.block_until_ready(stf)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            stf, poses = replay(states, r[boot:], v[boot:])
            jax.block_until_ready(stf)
            best = min(best, time.time() - t0)
        pe = np.linalg.norm(np.asarray(poses)[:, :, :2] - tr[boot:, :, :2],
                            axis=-1)
        inst = np.sqrt((pe ** 2).mean(axis=0))
        print(f"{label:16s} {T * B / best:9.1f} inst-scans/s   "
              f"ate {np.sqrt((pe ** 2).mean()):.4f}  "
              f"median {np.median(inst):.4f}  max {pe.max():.3f}  "
              f"({best * 1e3 / T:.2f} ms/batch-scan)", flush=True)
        return T * B / best

    run(dataclasses.replace(base, matcher_mode="onehot_bf16"), "sub4_onehot")
    run(dataclasses.replace(base, matcher_mode="pallas"), "sub4_pallas")

    if args.match_only:
        # matcher-only: replay where maps never update (motion gates can't
        # fire because poses barely move -> isolate the match cost)
        for mode in ("onehot_bf16", "pallas"):
            cfg = dataclasses.replace(base, matcher_mode=mode,
                                      min_distance_diff_for_map_update=1e9,
                                      min_angle_diff_for_map_update=1e9)
            run(cfg, f"match_{mode}")


if __name__ == "__main__":
    main()
