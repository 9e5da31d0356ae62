"""Host IO runtime — ctypes bindings over the native C++ library.

The framework's host-side data path (the role BaseSLAM/ParallelWorker.cs +
SignalConcurrentQueue.cs play in the reference, redesigned for an accelerator:
ingest -> de-skew/pack -> device): see native/slamnet_host.cpp.

The shared library is built on demand with `make` (g++); every component has the
same semantics on the Python side, so environments without a toolchain can still
read/write scan logs via the numpy fallback codec in ``slog_fallback``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libslamnet_host.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def load_library(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not (build_if_missing and _build()):
            return None
    lib = ctypes.CDLL(_LIB_PATH)

    lib.sq_create.restype = ctypes.c_void_p
    lib.sq_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
    lib.sq_destroy.argtypes = [ctypes.c_void_p]
    lib.sq_close.argtypes = [ctypes.c_void_p]
    lib.sq_push.restype = ctypes.c_int
    lib.sq_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
    lib.sq_pop.restype = ctypes.c_int
    lib.sq_pop.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
    lib.sq_size.restype = ctypes.c_size_t
    lib.sq_size.argtypes = [ctypes.c_void_p]
    lib.sq_dropped.restype = ctypes.c_uint64
    lib.sq_dropped.argtypes = [ctypes.c_void_p]

    lib.slog_open_write.restype = ctypes.c_void_p
    lib.slog_open_write.argtypes = [ctypes.c_char_p, ctypes.c_uint32]
    lib.slog_append.restype = ctypes.c_int
    lib.slog_append.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_void_p]
    lib.slog_close_write.argtypes = [ctypes.c_void_p]
    lib.slog_open_read.restype = ctypes.c_void_p
    lib.slog_open_read.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_uint32)]
    lib.slog_read.restype = ctypes.c_int
    lib.slog_read.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
                              ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.slog_close_read.argtypes = [ctypes.c_void_p]

    lib.pack_polar_deskew.argtypes = [ctypes.c_void_p] * 4 + [
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
    lib.slam_crc32.restype = ctypes.c_uint32
    lib.slam_crc32.argtypes = [ctypes.c_char_p, ctypes.c_size_t]

    lib.carmen_scan_count.restype = ctypes.c_int64
    lib.carmen_scan_count.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64]
    lib.carmen_read.restype = ctypes.c_int64
    lib.carmen_read.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]

    _lib = lib
    return lib


class ScanQueue:
    """Bounded blocking ring buffer of fixed-size scan slots (native-backed)."""

    def __init__(self, capacity: int, slot_bytes: int):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._slot = slot_bytes
        self._q = lib.sq_create(capacity, slot_bytes)

    def push(self, data: bytes, timeout_ms: int = -1) -> int:
        assert len(data) == self._slot
        return self._lib.sq_push(self._q, data, timeout_ms)

    def pop(self, timeout_ms: int = -1) -> Optional[bytes]:
        buf = ctypes.create_string_buffer(self._slot)
        r = self._lib.sq_pop(self._q, buf, timeout_ms)
        return buf.raw if r == 1 else None

    def __len__(self) -> int:
        return self._lib.sq_size(self._q)

    @property
    def dropped(self) -> int:
        return self._lib.sq_dropped(self._q)

    def close(self):
        self._lib.sq_close(self._q)

    def __del__(self):
        try:
            self._lib.sq_destroy(self._q)
        except Exception:
            pass


class SlogWriter:
    """Binary scan-log writer (.slog, CRC32-checked records)."""

    def __init__(self, path: str, num_beams: int):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.num_beams = num_beams
        self._w = lib.slog_open_write(path.encode(), num_beams)
        if not self._w:
            raise IOError(f"cannot open {path}")

    def append(self, ts_ns: int, odom, radii, valid) -> None:
        odom = np.ascontiguousarray(odom, np.float32)
        radii = np.ascontiguousarray(radii, np.float32)
        bits = np.packbits(np.asarray(valid, bool), bitorder="little")
        r = self._lib.slog_append(self._w, ts_ns, odom.ctypes.data,
                                  radii.ctypes.data, bits.ctypes.data)
        if r != 0:
            raise IOError("slog append failed")

    def close(self):
        if self._w:
            self._lib.slog_close_write(self._w)
            self._w = None


class SlogReader:
    """Binary scan-log reader; iterates (ts_ns, odom[3], radii[N], valid[N])."""

    def __init__(self, path: str):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        nb = ctypes.c_uint32()
        self._r = lib.slog_open_read(path.encode(), ctypes.byref(nb))
        if not self._r:
            raise IOError(f"cannot open {path}")
        self.num_beams = nb.value

    def __iter__(self):
        return self

    def __next__(self):
        ts = ctypes.c_uint64()
        odom = np.empty(3, np.float32)
        radii = np.empty(self.num_beams, np.float32)
        bits = np.empty((self.num_beams + 7) // 8, np.uint8)
        r = self._lib.slog_read(self._r, ctypes.byref(ts), odom.ctypes.data,
                                radii.ctypes.data, bits.ctypes.data)
        if r == 0:
            raise StopIteration
        if r == -1:
            raise IOError("corrupt slog record (CRC mismatch)")
        valid = np.unpackbits(bits, bitorder="little")[: self.num_beams] \
            .astype(bool)
        return ts.value, odom, radii, valid

    def close(self):
        if self._r:
            self._lib.slog_close_read(self._r)
            self._r = None


def pack_polar_deskew(angles, radii, valid, seg_poses) -> Tuple[np.ndarray,
                                                                np.ndarray]:
    """Native de-skew pack: [S, N] polar rays -> ([S*N, 2] points, [S*N] valid).

    Same contract as core.scan.segments_to_cloud (CoreSLAMProcessor.cs:187-207).
    """
    lib = load_library()
    angles = np.ascontiguousarray(angles, np.float32)
    radii = np.ascontiguousarray(radii, np.float32)
    seg_poses = np.ascontiguousarray(seg_poses, np.float32)
    s, n = angles.shape
    vu8 = np.ascontiguousarray(np.asarray(valid, bool), np.uint8)
    out_p = np.empty((s * n, 2), np.float32)
    out_v = np.empty(s * n, np.uint8)
    if lib is not None:
        lib.pack_polar_deskew(angles.ctypes.data, radii.ctypes.data,
                              vu8.ctypes.data, seg_poses.ctypes.data, s, n,
                              out_p.ctypes.data, out_v.ctypes.data)
    else:  # numpy fallback
        rel = seg_poses - seg_poses[-1]
        a = angles + rel[:, None, 2]
        out_p[:, 0] = (rel[:, None, 0] + radii * np.cos(a)).reshape(-1)
        out_p[:, 1] = (rel[:, None, 1] + radii * np.sin(a)).reshape(-1)
        out_v[:] = vu8.reshape(-1)
    return out_p, out_v.astype(bool)


def read_carmen_native(path: str, max_scans: int | None = None):
    """Native-parser twin of io.datasets.read_carmen (FLASER logs).

    Parses the log in C++ (native/slamnet_host.cpp carmen_read) into the same
    LidarLog contract — the real-robot ingestion path at native speed, bit-
    identical to the Python reader (tests/test_hostio.py).  Returns None when
    the native library is unavailable OR the log has no FLASER lines (e.g.
    ROBOTLASER1-format logs the Python reader handles) so callers can fall
    back to io.datasets.read_carmen; raises ValueError on malformed/
    mixed-beam logs like the twin.
    """
    lib = load_library()
    if lib is None:
        return None
    from ..io.datasets import SICK_MAX_RANGE, LidarLog, _flaser_angles

    beams = ctypes.c_int64(0)
    maxr = ctypes.c_double(0.0)
    has_truth = ctypes.c_int32(0)
    cap = -1 if max_scans is None else int(max_scans)
    t = lib.carmen_scan_count(path.encode(), ctypes.byref(beams),
                              ctypes.byref(maxr), ctypes.byref(has_truth),
                              cap)
    if t == 0:
        return None                 # not a FLASER log — Python reader's turn
    if t < 0:
        raise ValueError(f"carmen_scan_count({path}) failed: {t}")
    n = int(beams.value)
    ranges = np.empty((t, n), np.float32)
    odom = np.empty((t, 3), np.float32)
    truth = np.zeros((t, 3), np.float32)
    stamps = np.empty(t, np.float64)
    got = lib.carmen_read(path.encode(), t, n,
                          ranges.ctypes.data_as(ctypes.c_void_p),
                          odom.ctypes.data_as(ctypes.c_void_p),
                          truth.ctypes.data_as(ctypes.c_void_p),
                          stamps.ctypes.data_as(ctypes.c_void_p))
    if got != t:
        raise ValueError(f"carmen_read({path}) failed: {got} != {t}")
    max_range = float(maxr.value) if maxr.value > 0 else SICK_MAX_RANGE
    valid = (ranges > 0.0) & (ranges < 0.99 * max_range)
    return LidarLog(ranges=ranges, valid=valid, odometry=odom,
                    angles=_flaser_angles(n), max_range=max_range,
                    timestamps=stamps,
                    truth=truth if has_truth.value else None)
