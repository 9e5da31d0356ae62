"""Interactive simulation session (io/interactive.py) — headless smoke tests.

Covers the reference MainWindow's interaction contract
(Simulation/MainWindow.xaml.cs): left-drag teleport (:448-453), right-drag
heading (:459-465), Reset (:485-489, :143-151), and the Scan() loop with the
first-divergence oracle (:136-199) — exercised directly via the session API
(no HTTP server needed).
"""
import json
import math
import urllib.request

import numpy as np
import pytest

from slamnet_tpu.io.interactive import InteractiveSession, serve


@pytest.fixture(scope="module")
def session():
    s = InteractiveSession(platform="cpu", run_coreslam=True, seed=0)
    # bootstrap a few scans so the map exists
    for _ in range(12):
        s.step()
    return s


def test_bootstrap_tracks(session):
    # stationary robot at the start pose: hector must sit on top of it
    est = np.asarray(session.hstate.match_pose)
    real = session.real_pose
    assert float(np.hypot(*(est[:2] - real[:2]))) < 0.1
    assert session.diverged_at is None
    assert session.loops == 12


def test_mouse_commands(session):
    # heading command geometry
    session.set_heading_toward(20.0, 25.0)  # straight +y from (20, 20)
    assert abs(session.real_pose[2] - math.pi / 2) < 1e-5
    session.set_heading_toward(25.0, 20.0)  # back to +x
    assert abs(session.real_pose[2]) < 1e-5
    # a within-envelope drag (< coarsest-pixel-per-scan, README.md:35-39)
    # must be re-acquired by the matcher within a few scans
    for step in range(6):
        session.set_position(20.0 + 0.15 * (step + 1), 20.0)
        session.step()
    assert np.allclose(session.real_pose[:2], [20.9, 20.0])
    est = np.asarray(session.hstate.match_pose)
    assert float(np.hypot(*(est[:2] - session.real_pose[:2]))) < 0.2


def test_frame_snapshot(session):
    f = session.frame(level=1)
    assert f["level"] == 1
    assert f["size"] == session.hcfg.level_sizes[1]
    assert len(f["png"]) > 100  # a real PNG payload
    assert len(f["real"]) == 3 and len(f["hector"]) == 3
    assert "coreslam" in f
    assert f["levels"] == list(session.hcfg.level_sizes)
    # out-of-range level clamps instead of crashing
    assert session.frame(level=99)["level"] == session.hcfg.num_levels - 1
    # level -1 = the CoreSLAM hole-map layer (the reference's SLAM selector)
    h = session.frame(level=-1)
    assert h["level"] == -1
    assert h["size"] == session.ccfg.hole_map_size
    assert len(h["png"]) > 100


def test_reset(session):
    session.set_position(25.0, 22.0)
    session.reset()
    session.step()  # reset is consumed at the top of the loop (MainWindow:143)
    assert session.loops == 1
    assert np.allclose(session.real_pose, session.sim.start_pose)
    assert session.diverged_at is None


def test_http_roundtrip():
    s = InteractiveSession(platform="cpu", run_coreslam=False, seed=1)
    s.step()
    srv = serve(s, port=0)  # scan thread + server; port 0 = ephemeral
    try:
        port = srv.server_address[1]
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10).read()
        assert b"interactive" in page
        state = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/state?level=0", timeout=30).read())
        assert state["size"] == s.hcfg.level_sizes[0]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/pose",
            data=json.dumps({"x": 19.0, "y": 19.0}).encode(), method="POST")
        assert json.loads(urllib.request.urlopen(req, timeout=10).read())["ok"]
        assert np.allclose(s.real_pose[:2], [19.0, 19.0])
    finally:
        s.stop()
        srv.shutdown()
