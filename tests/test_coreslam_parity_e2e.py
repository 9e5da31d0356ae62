"""End-to-end CoreSLAM parity vs the composed golden oracle (VERDICT task 4).

The golden oracle (tests/golden.py GoldenCoreSlam) is the reference's full
Update() pipeline — search prior, Monte-Carlo candidate search, exact
sequential hole-map V-profile draws — replayed in numpy over the SAME scan log
as the JAX parity pipeline with a matched candidate budget.  Both are
stochastic, so parity means the drift ENVELOPE: the JAX parity-mode ATE must
sit within a band of the oracle's.  This test fails if parity-mode drift
regresses ~2x (what the reference would never produce on this trajectory).
"""
import jax
import jax.numpy as jnp
import numpy as np

from slamnet_tpu.core import CoreSlamConfig, SimConfig
from slamnet_tpu.core.scan import Scan
from slamnet_tpu.models import coreslam
from slamnet_tpu.sim import default_field, lidar
from slamnet_tpu.sim.trajectory import loop_trajectory

import golden

N_SCANS = 96
CFG = CoreSlamConfig(num_candidates=4096)


def _scan_log():
    sim = SimConfig()
    fld = default_field()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))
    traj = loop_trajectory(speed=0.3)[:N_SCANS]

    @jax.jit
    def gen(poses, key):
        keys = jax.random.split(key, poses.shape[0])

        def one(p, k):
            return lidar.scan_revolution(fld, p, angles, sim.max_scan_dist,
                                         sim.measure_error, k)
        return jax.vmap(one)(poses, keys)

    radii, valids = gen(jnp.asarray(traj), jax.random.PRNGKey(0))
    a = np.asarray(angles)
    pts = np.stack([np.asarray(radii) * np.cos(a)[None],
                    np.asarray(radii) * np.sin(a)[None]], -1)
    return np.asarray(traj), pts.astype(np.float32), np.asarray(valids)


def _ate(poses, traj):
    err = np.asarray(poses)[:, :2] - traj[:, :2]
    return float(np.sqrt((np.linalg.norm(err, axis=1) ** 2).mean()))


def _run_oracle(traj, pts, valids, seed):
    g = golden.GoldenCoreSlam(
        size=CFG.hole_map_size, scale=CFG.hole_scale, start_pose=traj[0],
        sigma_xy=CFG.sigma_xy, sigma_theta=CFG.sigma_theta,
        num_candidates=CFG.num_candidates, hole_width=CFG.hole_width,
        quality=CFG.quality, warmup=CFG.position_search_beginning, seed=seed)
    poses = []
    for t in range(traj.shape[0]):
        # the replay harness feeds the estimate back as odometry, exactly as
        # the simulator does (MainWindow.xaml.cs:380-407) and as bench.py does
        poses.append(g.update(pts[t][valids[t]], g.pose))
    return np.asarray(poses)


def _run_jax(traj, pts, valids, seed):
    state = coreslam.init(CFG, traj[0], key=jax.random.PRNGKey(seed))

    @jax.jit
    def replay(state, pts, valids):
        def body(st, inp):
            p, v = inp
            st, _ = coreslam.update_cloud(
                st, Scan(p, v, jnp.zeros(3, jnp.float32)), st.pose, CFG)
            return st, st.pose
        return jax.lax.scan(body, state, (pts, valids))

    _, poses = replay(state, jnp.asarray(pts), jnp.asarray(valids))
    return np.asarray(poses)


def test_parity_mode_ate_within_oracle_band():
    # 5 seeds per side + a dispersion-aware acceptance band (SURVEY hard part
    # 2: "statistical acceptance bands"; VERDICT r02 weak #9 asked for >= 5
    # seeds so a single-seed fluke can't pass/fail the tripwire)
    traj, pts, valids = _scan_log()

    oracle_ates = np.asarray([_ate(_run_oracle(traj, pts, valids, seed), traj)
                              for seed in range(5)])
    jax_ates = np.asarray([_ate(_run_jax(traj, pts, valids, seed), traj)
                           for seed in range(5)])

    o = float(oracle_ates.mean())
    j = float(jax_ates.mean())
    o_sd = float(oracle_ates.std(ddof=1))
    j_sd = float(jax_ates.std(ddof=1))
    # dispersion-aware band: the mean gap must sit within 3 combined standard
    # errors OR the classic 2x envelope, whichever is looser (both stochastic
    # MC pipelines; same drift family, not identical RNG streams)
    se = np.sqrt(o_sd ** 2 / 5 + j_sd ** 2 / 5)
    upper = max(2.0 * o, o + 3.0 * se)
    lower = min(0.2 * o, max(o - 3.0 * se, 0.0))
    assert j < upper, (j, o, se, list(oracle_ates), list(jax_ates))
    assert j > lower, (j, o, se, list(oracle_ates), list(jax_ates))
    # both must actually track (sanity floor mirroring the sim's oracle),
    # and neither side's dispersion may explode (a bimodal/diverging seed)
    assert o < 0.5 and j < 0.5, (o, j)
    assert o_sd < 0.5 * max(o, 0.05) + 0.05, (o_sd, list(oracle_ates))
    assert j_sd < 0.5 * max(j, 0.05) + 0.05, (j_sd, list(jax_ates))
