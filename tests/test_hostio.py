"""Native host runtime: queue threading, slog codec round-trip + corruption
detection, de-skew pack equivalence with the jnp path."""
import os
import struct
import threading
import time

import numpy as np
import pytest

from slamnet_tpu import hostio
from slamnet_tpu.core.scan import SegmentScan, segments_to_cloud

pytestmark = pytest.mark.skipif(hostio.load_library() is None,
                                reason="native toolchain unavailable")


def test_scan_queue_threaded_handoff():
    slot = 64
    q = hostio.ScanQueue(capacity=4, slot_bytes=slot)
    got = []

    def consumer():
        while True:
            item = q.pop(timeout_ms=2000)
            if item is None:
                break
            got.append(item)
            if len(got) == 20:
                break

    t = threading.Thread(target=consumer)
    t.start()
    for i in range(20):
        assert q.push(struct.pack("<q", i).ljust(slot, b"\0"), timeout_ms=2000) == 1
    t.join(timeout=5)
    assert len(got) == 20
    assert [struct.unpack_from("<q", g)[0] for g in got] == list(range(20))
    assert q.dropped == 0


def test_scan_queue_drop_on_full():
    q = hostio.ScanQueue(capacity=2, slot_bytes=8)
    assert q.push(b"\x00" * 8, timeout_ms=0) == 1
    assert q.push(b"\x01" * 8, timeout_ms=0) == 1
    assert q.push(b"\x02" * 8, timeout_ms=0) == 0   # full -> dropped
    assert q.dropped == 1
    assert len(q) == 2


def test_slog_roundtrip(tmp_path):
    path = str(tmp_path / "t.slog")
    n = 40
    rng = np.random.default_rng(0)
    w = hostio.SlogWriter(path, n)
    records = []
    for i in range(7):
        odom = rng.normal(size=3).astype(np.float32)
        radii = rng.uniform(0, 40, n).astype(np.float32)
        valid = rng.random(n) > 0.3
        w.append(1000 + i, odom, radii, valid)
        records.append((1000 + i, odom, radii, valid))
    w.close()

    r = hostio.SlogReader(path)
    assert r.num_beams == n
    out = list(r)
    r.close()
    assert len(out) == 7
    for (ts, od, ra, va), (wts, wod, wra, wva) in zip(out, records):
        assert ts == wts
        np.testing.assert_array_equal(od, wod)
        np.testing.assert_array_equal(ra, wra)
        np.testing.assert_array_equal(va, wva)


def test_slog_detects_corruption(tmp_path):
    path = str(tmp_path / "c.slog")
    n = 16
    w = hostio.SlogWriter(path, n)
    w.append(1, np.zeros(3, np.float32), np.ones(n, np.float32),
             np.ones(n, bool))
    w.close()
    data = bytearray(open(path, "rb").read())
    data[30] ^= 0xFF                      # flip a payload byte
    open(path, "wb").write(bytes(data))
    r = hostio.SlogReader(path)
    with pytest.raises(IOError):
        next(r)


def test_pack_polar_deskew_matches_jnp():
    rng = np.random.default_rng(1)
    s, n = 3, 50
    angles = rng.uniform(0, 2 * np.pi, (s, n)).astype(np.float32)
    radii = rng.uniform(0.5, 30, (s, n)).astype(np.float32)
    valid = rng.random((s, n)) > 0.2
    poses = rng.normal(0, 1, (s, 3)).astype(np.float32)

    pts, v = hostio.pack_polar_deskew(angles, radii, valid, poses)

    import jax.numpy as jnp
    seg = SegmentScan(jnp.asarray(angles), jnp.asarray(radii),
                      jnp.asarray(valid), jnp.asarray(poses))
    cloud = segments_to_cloud(seg)
    np.testing.assert_allclose(pts, np.asarray(cloud.points), atol=2e-5)
    np.testing.assert_array_equal(v, np.asarray(cloud.valid))


def test_native_carmen_reader_bit_identical():
    """carmen_read (native/slamnet_host.cpp) must produce the exact LidarLog
    the Python reader does on both checked-in logs — including the "# TRUTH"
    sidecar, the PARAM max-range line, and strtod->f32 parsing (bit-identical
    to Python's float(text) -> np.float32 path)."""
    from slamnet_tpu.io import datasets

    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "data")
    for name in ("sim_loop.clf", "adversarial_180.clf"):
        path = os.path.join(base, name)
        a = hostio.read_carmen_native(path)
        b = datasets.read_carmen(path)
        np.testing.assert_array_equal(a.ranges, b.ranges)
        np.testing.assert_array_equal(a.valid, b.valid)
        np.testing.assert_array_equal(a.odometry, b.odometry)
        np.testing.assert_array_equal(a.timestamps, b.timestamps)
        np.testing.assert_allclose(a.angles, b.angles)
        assert a.max_range == b.max_range
        assert (a.truth is None) == (b.truth is None)
        if a.truth is not None:
            np.testing.assert_array_equal(a.truth, b.truth)

    # max_scans honored (both passes)
    path = os.path.join(base, "adversarial_180.clf")
    a = hostio.read_carmen_native(path, max_scans=7)
    b = datasets.read_carmen(path, max_scans=7)
    assert a.ranges.shape == b.ranges.shape == (7, 181)
    np.testing.assert_array_equal(a.ranges, b.ranges)


def test_native_carmen_reader_rejects_garbage(tmp_path):
    # no FLASER lines (e.g. a ROBOTLASER1-format log): native returns None so
    # callers fall back to the Python reader (ADVICE r04)
    p = tmp_path / "empty.clf"
    p.write_text("# nothing here\nODOM 1 2 3 0 0 0 5 h 5\n")
    assert hostio.read_carmen_native(str(p)) is None
    q = tmp_path / "mixed.clf"
    q.write_text("FLASER 2 1.0 2.0 0 0 0 0 0 0 1 h 1\n"
                 "FLASER 3 1.0 2.0 3.0 0 0 0 0 0 0 2 h 2\n")
    with pytest.raises(ValueError):
        hostio.read_carmen_native(str(q))


def test_native_carmen_reader_truth_and_truncation(tmp_path):
    # stray extra '# TRUTH' line -> truths != scans -> no truth array (the
    # Python twin's exact 1:1 contract); a truncated FLASER line errors
    # instead of silently zero-filling (ADVICE r04)
    p = tmp_path / "extra_truth.clf"
    p.write_text("# TRUTH 0 0 0\n"
                 "FLASER 2 1.0 2.0 0 0 0 0 0 0 1 h 1\n"
                 "# TRUTH 1 1 0\n")
    log = hostio.read_carmen_native(str(p))
    if log is not None:                       # native lib present
        assert log.truth is None
    q = tmp_path / "truncated.clf"
    q.write_text("FLASER 5 1.0 2.0\n")
    with pytest.raises(ValueError):
        hostio.read_carmen_native(str(q))
