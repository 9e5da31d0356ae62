"""io/ subsystem: checkpoint round-trips, wire formats, metrics semantics."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from slamnet_tpu.core import CoreSlamConfig, HectorConfig
from slamnet_tpu.io import checkpoint, export, metrics
from slamnet_tpu.models import coreslam, hector


def test_checkpoint_roundtrip_coreslam(tmp_path):
    cfg = CoreSlamConfig()
    st = coreslam.init(cfg, (20.0, 20.0, 0.5), key=jax.random.PRNGKey(7))
    st = st._replace(pose=jnp.asarray([1.0, 2.0, 0.3]),
                     scan_count=jnp.asarray(9, jnp.int32))
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, st, {"scan": 9})
    like = coreslam.init(cfg, (0.0, 0.0, 0.0))
    back = checkpoint.restore(path, like)
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert checkpoint.load_metadata(path)["scan"] == 9


def test_checkpoint_roundtrip_hector(tmp_path):
    cfg = HectorConfig(num_levels=2, map_size=64, estimate_iterations=(3, 3))
    st = hector.init(cfg, (1.0, 2.0, 0.0))
    st = st._replace(maps=st.maps.at[5].set(3.3))
    path = str(tmp_path / "h")
    checkpoint.save(path, st)
    back = checkpoint.restore(path, hector.init(cfg, (0, 0, 0)))
    np.testing.assert_allclose(np.asarray(back.maps), np.asarray(st.maps))


def test_packed_hole_pixels_matches_reference_packing():
    # GetPackedPixels: byte = ((p[2i] >> 12) << 4) | (p[2i+1] >> 12)
    px = np.asarray([0xF000, 0x1000, 0xABCD, 0x0FFF], np.uint16)
    packed = export.packed_hole_pixels(px)
    assert list(packed) == [(0xF << 4) | 0x1, (0xA << 4) | 0x0]
    unpacked = export.unpack_hole_pixels(packed)
    assert list(unpacked) == [0xF000, 0x1000, 0xA000, 0x0000]


def test_occupancy_bitmap_values():
    lo = np.asarray([0.0, 5.0, -2.0, 0.0], np.float32)
    img = export.occupancy_bitmap(lo, 2)
    # 127 unscanned, 0 occupied, 254 free (GridMap.cs:104-115)
    assert img.tolist() == [[127, 0], [254, 127]]


def test_pose_codec_roundtrip():
    p = np.asarray([1.5, -2.25, 0.125], np.float32)
    b = export.pose_to_bytes(p)
    assert len(b) == 12
    np.testing.assert_array_equal(export.pose_from_bytes(b), p)


def test_vec2_codec_and_pose_string():
    v = np.asarray([3.5, -0.75], np.float32)
    b = export.vec2_to_bytes(v)
    assert len(b) == 8
    np.testing.assert_array_equal(export.vec2_from_bytes(b), v)
    # VectorEx.ToPoseString format (BaseSLAM/VectorEx.cs:194-197)
    s = export.pose_string([1.0, 2.0, np.pi / 2])
    assert s == "1.00m x 2.00m @ 90.00\N{DEGREE SIGN}"


def test_ema_timer_reference_formula():
    t = metrics.EmaTimer()
    t.update(0.004)      # 4 ms
    assert abs(t.ms - 1.0) < 1e-9          # (3*0 + 4)/4
    t.update(0.004)
    assert abs(t.ms - (3 * 1.0 + 4.0) / 4) < 1e-9


def test_divergence_monitor_latches_once():
    log = metrics.RingLog()
    for i in range(40):
        log.log(f"scan {i}")
    mon = metrics.DivergenceMonitor(log=log)
    assert not mon.check(0, (0, 0, 0), (0.5, 0, 0))
    assert mon.check(1, (0, 0, 0), (1.5, 0, 0))       # first divergence
    assert not mon.check(2, (0, 0, 0), (5.0, 0, 0))   # latched
    assert mon.diverged_at == 1
    assert len(mon.report) == 31                       # headline + 30 log lines


def test_ring_log_trimming():
    log = metrics.RingLog(high_water=130, drop=100)
    for i in range(131):
        log.log(str(i))
    assert len(log.items) == 31
    assert log.items[0] == "Information: 100"


def test_sharded_checkpoint_roundtrip_across_mesh_shapes(tmp_path):
    # save on a tile=4 mesh, restore on tile=2 — the checkpoint is dense, so
    # the mesh shape may change across restarts (elastic restart)
    import jax as _jax
    import pytest
    if len(_jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import jax.numpy as jnp
    from slamnet_tpu.core import HectorConfig
    from slamnet_tpu.io import checkpoint
    from slamnet_tpu.models import hector, hector_sharded
    from slamnet_tpu.parallel import make_mesh

    cfg = HectorConfig(num_levels=2, map_size=64, estimate_iterations=(3, 3),
                       map_resolution=0.625)
    rng = np.random.default_rng(0)
    dense = hector.init(cfg, (20.0, 20.0, 0.0))
    dense = dense._replace(
        maps=jnp.asarray(rng.normal(0, 1, cfg.total_cells), jnp.float32))

    mesh4 = make_mesh({"tile": 4, "search": 2})
    sh = hector_sharded.shard_state(mesh4, dense, cfg)
    path = str(tmp_path / "ckpt")
    checkpoint.save_sharded(path, sh, cfg, metadata={"scan": 7})
    assert checkpoint.load_metadata(path)["scan"] == 7

    mesh2 = make_mesh({"tile": 2, "search": 4})
    like = hector.init(cfg, (0.0, 0.0, 0.0))
    back = checkpoint.restore_sharded(path, mesh2, cfg, like)
    np.testing.assert_array_equal(
        np.asarray(hector_sharded.unshard_maps(back, cfg)),
        np.asarray(dense.maps))
    np.testing.assert_array_equal(np.asarray(back.match_pose),
                                  np.asarray(dense.match_pose))
