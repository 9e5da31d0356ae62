#!/usr/bin/env python
"""On-chip parity check for the Pallas VMEM-resident matcher (VERDICT r04).

tests/test_pallas_onehot.py asserts interpret-mode parity on CPU; this script
makes the flagship kernel's on-TPU correctness self-verifying: it replays the
bench trajectory twice — matcher_mode="pallas" vs "onehot_bf16" (the XLA twin
with identical selection semantics; only float summation order differs) —
with dense fills, and exits NONZERO if the pose tracks diverge beyond float
tolerance or either track's ATE breaks the bench gate.

Run on the real chip (default platform):  python scripts/check_pallas_parity.py
Exit 0 = parity holds; 1 = divergence (prints the worst scan).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POSE_TOL_M = 0.02        # max |pose_pallas - pose_onehot| (xy, meters)
POSE_TOL_RAD = 0.01      # heading
ATE_TOL_M = 0.01         # both tracks must stay reference-grade


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np
    import jax.numpy as jnp

    from slamnet_tpu.core import HectorConfig, SimConfig
    from slamnet_tpu.core.scan import Scan
    from slamnet_tpu.models import hector
    from slamnet_tpu.sim import default_field, lidar
    from slamnet_tpu.sim.trajectory import loop_trajectory

    n_scans, boot = 256, 10
    sim = SimConfig()
    cpu = jax.devices("cpu")[0]
    fld = default_field()
    angles_np = lidar.revolution_angles(sim.num_scan_points)
    traj = loop_trajectory(speed=0.3)[: n_scans + boot]
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
    traj_d = jax.device_put(jnp.asarray(traj), dev)
    base = HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4),
                        dense_free_fill=True)

    def run(mode):
        cfg = dataclasses.replace(base, matcher_mode=mode)

        @jax.jit
        def replay(state, radii, valids, force, boots):
            def body(st, inp):
                r, v, f, b = inp
                pts = jnp.stack([r * jnp.cos(angles),
                                 r * jnp.sin(angles)], -1)
                hint = jnp.where(f, b, st.match_pose)
                st, _ = hector.update(st, Scan(pts, v,
                                               jnp.zeros(3, jnp.float32)),
                                      hint, cfg, f)
                return st, st.match_pose
            return jax.lax.scan(body, state,
                                (radii, valids, force, boots))

        st = hector.init(cfg, traj[0])
        force = jnp.arange(traj.shape[0]) < boot
        t0 = time.time()
        stf, poses = replay(st, radii, valids, force, traj_d)
        jax.block_until_ready(stf)
        print(f"{mode}: {traj.shape[0] / (time.time() - t0):.0f} scans/s "
              f"(incl. compile)", flush=True)
        return np.asarray(poses)

    # ---- dense-fill lookup parity on-chip: the TPU branch (one-hot MXU
    # matmul, bf16x2-split table) vs the exact gather, same device --------
    from slamnet_tpu.ops.holemap import _onehot_lookup
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.uniform(0.0, 566.0, 256), jnp.float32)
    cbin = jnp.asarray(rng.integers(0, 256, (400, 400)), jnp.int32)
    lk = jax.jit(lambda t, c: _onehot_lookup(t, c, 256))(table, cbin)
    gt = jax.jit(lambda t, c: jnp.take(t, c))(table, cbin)
    dmax = float(jnp.abs(lk - gt).max())
    print(f"fill-lookup parity: max |onehot - gather| = {dmax:.6f} px")
    if dmax > 0.01:
        print("PARITY FAILED (fill lookup)")
        return 1

    p_ref = run("onehot_bf16")
    p_pal = run("pallas")

    dxy = np.linalg.norm(p_pal[:, :2] - p_ref[:, :2], axis=1)
    dth = np.abs((p_pal[:, 2] - p_ref[:, 2] + np.pi) % (2 * np.pi) - np.pi)
    worst = int(dxy.argmax())

    def ate(p):
        pe = np.linalg.norm(p[boot:, :2] - traj[boot:, :2], axis=1)
        return float(np.sqrt((pe ** 2).mean()))

    a_ref, a_pal = ate(p_ref), ate(p_pal)
    print(f"max |pose diff|: {dxy.max():.6f} m / {dth.max():.6f} rad "
          f"(scan {worst})")
    print(f"ATE: onehot {a_ref:.4f}  pallas {a_pal:.4f}")
    ok = (dxy.max() <= POSE_TOL_M and dth.max() <= POSE_TOL_RAD
          and a_ref <= ATE_TOL_M and a_pal <= ATE_TOL_M)
    print("PARITY OK" if ok else "PARITY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
