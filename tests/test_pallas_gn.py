"""Pallas full-matcher kernel (interpret mode) == the XLA fused matcher."""
import jax
import jax.numpy as jnp
import numpy as np

from slamnet_tpu.core import HectorConfig, SimConfig
from slamnet_tpu.core.scan import Scan
from slamnet_tpu.models import hector
from slamnet_tpu.ops import pallas_gn
from slamnet_tpu.sim import default_field, lidar


def test_match_pallas_interpret_equals_xla_matcher():
    cfg = HectorConfig(num_levels=3, estimate_iterations=(7, 4, 4))
    sim = SimConfig()
    fld = default_field()
    angles = jnp.asarray(lidar.revolution_angles(sim.num_scan_points))
    truth = jnp.asarray([20.0, 20.0, 0.0], jnp.float32)
    state = hector.init(cfg, truth)
    key = jax.random.PRNGKey(0)
    for t in range(8):
        key, sub = jax.random.split(key)
        radii, valid = lidar.scan_revolution(fld, truth, angles,
                                             sim.max_scan_dist,
                                             sim.measure_error, sub)
        pts = jnp.stack([radii * jnp.cos(angles), radii * jnp.sin(angles)], -1)
        state, _ = hector.update(state, Scan(pts, valid, jnp.zeros(3)),
                                 truth, cfg, map_without_matching=True)

    key, sub = jax.random.split(key)
    radii, valid = lidar.scan_revolution(fld, truth, angles,
                                         sim.max_scan_dist,
                                         sim.measure_error, sub)
    pts = jnp.stack([radii * jnp.cos(angles), radii * jnp.sin(angles)], -1)
    hint = truth + jnp.asarray([0.15, -0.1, 0.05])

    xla_state, _ = hector.update(state, Scan(pts, valid, jnp.zeros(3)),
                                 hint, cfg)

    n = pts.shape[0]
    pad = -(-n // 128) * 128
    X = jnp.concatenate([pts[:, 0], jnp.zeros(pad - n)])
    Y = jnp.concatenate([pts[:, 1], jnp.zeros(pad - n)])
    V = jnp.concatenate([valid, jnp.zeros(pad - n, bool)])
    pose = pallas_gn.match_pallas(state.maps, cfg, hint, X, Y, V,
                                  interpret=True)
    # per-beam sequential accumulation vs the [9,N] vector reduce: float
    # summation order differs, poses agree to ~1e-3 px
    np.testing.assert_allclose(np.asarray(pose),
                               np.asarray(xla_state.match_pose),
                               rtol=0, atol=2e-3)
