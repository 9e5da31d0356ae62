#!/usr/bin/env python
"""CoreSLAM correlative-search operand-dtype experiment (round 4).

The production search is bound by the loop-variant operand traffic: the
stacked score planes `big` are [3*W*W, spad^2] f32 ~ 57 MB rebuilt and read
per scan, plus two [K, N, spad] one-hot count masks.  Every value involved
is a small integer (hi/lo planes <= 255, masks 0/1) — exactly representable
in bf16 — and the MXU's default precision rounds f32 operands to bf16 anyway,
so storing them in bf16 halves the HBM traffic without changing a single
score bit (cell counts above 256 would round, but that needs >256 beams in
one pixel — beyond the degenerate cases the default precision already
rounds today).

Variants (full production CoreSLAM pipeline replay, 512-scan loop):
  base       ops/correlate.correlative_scores as shipped (f32 operands)
  bf16       one-hot masks + stacked planes stored/fed as bf16

Usage: python scripts/bench_correlate_bf16.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import numpy as np
    import jax.numpy as jnp

    from slamnet_tpu.core import CoreSlamConfig, SimConfig
    from slamnet_tpu.core.scan import Scan
    from slamnet_tpu.core.geometry import csharp_trunc
    from slamnet_tpu.models import coreslam
    from slamnet_tpu.ops import correlate
    from slamnet_tpu.sim import default_field, lidar
    from slamnet_tpu.sim.trajectory import loop_trajectory

    def scores_bf16(hole_map_flat, size, scale, points, valid, search_pose,
                    thetas, window):
        K = thetas.shape[0]
        R = window // 2
        spad = size + 2 * R
        px = search_pose[0] * scale + 0.5
        py = search_pose[1] * scale + 0.5
        c = (jnp.cos(thetas) * scale)[:, None]
        s = (jnp.sin(thetas) * scale)[:, None]
        X = points[:, 0][None, :]
        Y = points[:, 1][None, :]
        xb = csharp_trunc(px + c * X - s * Y)
        yb = csharp_trunc(py + s * X + c * Y)
        ok = (valid[None, :] & (xb >= -R) & (xb < size + R)
              & (yb >= -R) & (yb < size + R))
        grid_ids = jnp.arange(spad, dtype=xb.dtype)
        oh_y = ((yb + R)[:, :, None] == grid_ids).astype(jnp.bfloat16) \
            * ok[:, :, None].astype(jnp.bfloat16)
        oh_x = ((xb + R)[:, :, None] == grid_ids).astype(jnp.bfloat16)
        cnt = jnp.einsum("kns,knt->kst", oh_y, oh_x,
                         preferred_element_type=jnp.float32).reshape(
            K, spad * spad)
        q = jnp.zeros((size + 4 * R, size + 4 * R), jnp.int32)
        q = jax.lax.dynamic_update_slice(q, hole_map_flat.reshape(size, size),
                                         (2 * R, 2 * R))
        ones = jnp.zeros((size + 4 * R, size + 4 * R), jnp.bfloat16)
        ones = jax.lax.dynamic_update_slice(
            ones, jnp.ones((size, size), jnp.bfloat16), (2 * R, 2 * R))
        qhi = (q >> 8).astype(jnp.bfloat16)
        qlo = (q & 0xFF).astype(jnp.bfloat16)
        shifts = []
        for plane in (qhi, qlo, ones):
            for dy in range(window):
                for dx in range(window):
                    shifts.append(jax.lax.dynamic_slice(
                        plane, (dy, dx), (spad, spad)).reshape(-1))
        big = jnp.stack(shifts)                     # bf16 [3*W*W, spad*spad]
        w2 = window * window
        out = jnp.dot(cnt.astype(jnp.bfloat16), big.T,
                      preferred_element_type=jnp.float32)
        sums = (256.0 * out[:, :w2] + out[:, w2:2 * w2]).astype(jnp.int32)
        nb = out[:, 2 * w2:].astype(jnp.int32)
        return (sums.reshape(K, window, window), nb.reshape(K, window, window))

    sim = SimConfig()
    n_scans, bootstrap = 512, 10
    cfg = dataclasses.replace(CoreSlamConfig(), search_mode="correlative",
                              dense_hole_fill=True, dense_obstacle_fill=True)

    cpu = jax.devices("cpu")[0]
    fld = default_field()
    angles_np = lidar.revolution_angles(sim.num_scan_points)
    traj = loop_trajectory(speed=0.3)[: n_scans + bootstrap]
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

        radii_c, valids_c = genlog(jax.device_put(jnp.asarray(traj), cpu),
                                   jax.device_put(jax.random.PRNGKey(0), cpu))
    dev = jax.devices()[0]
    radii = jax.device_put(np.asarray(radii_c), dev)
    valids = jax.device_put(np.asarray(valids_c), dev)
    angles = jax.device_put(jnp.asarray(angles_np), dev)

    base_fn = correlate.correlative_scores

    def measure(fn):
        correlate.correlative_scores = fn
        state = coreslam.init(cfg, traj[0], key=jax.random.PRNGKey(1))

        @jax.jit
        def replay(state, radii, valids):
            def body(st, inp):
                r, v = inp
                pts = jnp.stack([r * jnp.cos(angles),
                                 r * jnp.sin(angles)], -1)
                st, _ = coreslam.update_cloud(
                    st, Scan(pts, v, jnp.zeros(3, jnp.float32)), st.pose, cfg)
                return st, st.pose
            return jax.lax.scan(body, state, (radii, valids))

        stf, poses = replay(state, radii, valids)
        jax.block_until_ready(stf)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            stf, poses = replay(state, radii, valids)
            jax.block_until_ready(stf)
            best = min(best, time.time() - t0)
        correlate.correlative_scores = base_fn
        err = np.asarray(poses) - traj
        pe = np.linalg.norm(err[:, :2], axis=1)
        return ((n_scans + bootstrap) / best,
                float(np.sqrt((pe ** 2).mean())), np.asarray(poses))

    r0, a0, p0 = measure(base_fn)
    r1, a1, p1 = measure(scores_bf16)
    bitwise = bool(np.array_equal(p0, p1))
    print(f"{'variant':>6} {'scans/s':>8} {'ate_m':>8}")
    print(f"{'base':>6} {r0:>8.1f} {a0:>8.4f}")
    print(f"{'bf16':>6} {r1:>8.1f} {a1:>8.4f}   poses bitwise equal: {bitwise}")


if __name__ == "__main__":
    main()
