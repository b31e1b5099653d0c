"""
Native host-ops loader: compiles hostops.cpp on first use (cached by source
hash) and exposes ctypes wrappers. Falls back to the pure-numpy
implementations when no compiler is available.
"""

import os
import ctypes
import hashlib
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hostops.cpp")

_lib = None
_lib_lock = threading.Lock()
_tried = False


_CXX_FLAGS = ["-O3", "-march=native", "-ffp-contract=off",
              "-shared", "-fPIC"]


def _build_and_load():
    with open(_SRC, "rb") as f:
        src = f.read()
    # -ffp-contract=off keeps float op-for-op parity with the numpy
    # oracle implementations (FMA contraction changes rounding, which
    # flips argmin winners at exact geometric ties)
    tag = hashlib.sha1(src + " ".join(_CXX_FLAGS).encode()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "TPL_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tpl_tpu_native"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"hostops_{tag}.so")

    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", *_CXX_FLAGS, "-o", tmp, _SRC]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)

    lib = ctypes.CDLL(so_path)

    lib.tpl_resample.restype = ctypes.c_int64
    lib.tpl_resample.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double)]

    lib.tpl_rampify_profile.restype = None
    lib.tpl_rampify_profile.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_double)]

    lib.tpl_project.restype = None
    lib.tpl_project.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_double)]

    lib.tpl_rampify_corridor.restype = None
    lib.tpl_rampify_corridor.argtypes = [
        ctypes.c_double, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double)]

    return lib


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lib_lock:
        if _lib is None and not _tried:
            _tried = True
            if os.environ.get("TPL_TPU_NO_NATIVE"):
                return None
            try:
                _lib = _build_and_load()
            except Exception:
                _lib = None
    return _lib


_shm_lib = None
_shm_tried = False


def _build_shm_and_load():
    src_path = os.path.join(_HERE, "shmstore.cpp")
    with open(src_path, "rb") as f:
        src = f.read()
    flags = ["-O2", "-shared", "-fPIC", "-pthread"]
    tag = hashlib.sha1(src + " ".join(flags).encode()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "TPL_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tpl_tpu_native"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"shmstore_{tag}.so")

    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        subprocess.run(["g++", *flags, "-o", tmp, src_path],
                       check=True, capture_output=True)
        os.replace(tmp, so_path)

    lib = ctypes.CDLL(so_path)
    lib.tpl_shm_open.restype = ctypes.c_void_p
    lib.tpl_shm_open.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.tpl_shm_lock.restype = ctypes.c_int
    lib.tpl_shm_lock.argtypes = [ctypes.c_void_p]
    lib.tpl_shm_unlock.restype = ctypes.c_int
    lib.tpl_shm_unlock.argtypes = [ctypes.c_void_p]
    lib.tpl_shm_version.restype = ctypes.c_uint64
    lib.tpl_shm_version.argtypes = [ctypes.c_void_p]
    lib.tpl_shm_capacity.restype = ctypes.c_int64
    lib.tpl_shm_capacity.argtypes = [ctypes.c_void_p]
    lib.tpl_shm_read.restype = ctypes.c_int64
    lib.tpl_shm_read.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64)]
    lib.tpl_shm_write.restype = ctypes.c_uint64
    lib.tpl_shm_write.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
    lib.tpl_shm_close.restype = None
    lib.tpl_shm_close.argtypes = [ctypes.c_void_p]
    return lib


def get_shm_lib():
    global _shm_lib, _shm_tried
    if _shm_lib is not None or _shm_tried:
        return _shm_lib
    with _lib_lock:
        if _shm_lib is None and not _shm_tried:
            _shm_tried = True
            if os.environ.get("TPL_TPU_NO_NATIVE"):
                return None
            try:
                _shm_lib = _build_shm_and_load()
            except Exception:
                _shm_lib = None
    return _shm_lib


class NativeShm:
    """One native store mapping (see shmstore.cpp). Raises RuntimeError
    if the native engine is unavailable or the open fails."""

    def __init__(self, path, size):
        lib = get_shm_lib()
        if lib is None:
            raise RuntimeError("native shm engine unavailable")
        self._lib = lib
        self._h = lib.tpl_shm_open(path.encode(), int(size))
        if not self._h:
            raise RuntimeError(f"tpl_shm_open failed for {path}")
        self.capacity = lib.tpl_shm_capacity(self._h)
        self._buf = ctypes.create_string_buffer(self.capacity)

    def lock(self):
        r = self._lib.tpl_shm_lock(self._h)
        if r < 0:
            raise RuntimeError("tpl_shm_lock failed")
        return r  # 1 = recovered from a dead owner

    def unlock(self):
        self._lib.tpl_shm_unlock(self._h)

    def version(self):
        return self._lib.tpl_shm_version(self._h)

    def read(self):
        """Returns (payload bytes, version). Caller holds the lock."""
        ver = ctypes.c_uint64()
        n = self._lib.tpl_shm_read(self._h, self._buf, self.capacity,
                                   ctypes.byref(ver))
        if n < 0:
            raise RuntimeError("shm payload larger than capacity")
        return ctypes.string_at(self._buf, n), ver.value

    def write(self, blob):
        ver = self._lib.tpl_shm_write(self._h, blob, len(blob))
        if ver == 0:
            raise RuntimeError(
                f"shm store overflow: {len(blob)} > {self.capacity}")
        return ver

    def close(self):
        if self._h:
            self._lib.tpl_shm_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def resample(points, sampling_dist, steps, start_index=0, closed=False):
    """Native twin of ops.geometry.resample; returns None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points[:, :2], dtype=np.float64)
    out = np.zeros((steps, 5), dtype=np.float64)
    if steps == 0 or len(pts) == 0:
        return out[:0]
    res = lib.tpl_resample(_ptr(pts), len(pts), float(sampling_dist),
                           int(steps), int(start_index), int(bool(closed)),
                           _ptr(out))
    if res < 0:
        raise RuntimeError("resampling failed")
    return out[:res] if res < steps else out


def project(points, positions, closed=False):
    """Native twin of ops.geometry._project_core.

    Returns an (M, 12) array with columns [start, end, alpha, index,
    point_x, point_y, distance, arc_len, angle, tangent_x, tangent_y,
    in_bounds], or None if the native lib is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points[:, :2], dtype=np.float64)
    pos = np.ascontiguousarray(positions, dtype=np.float64).reshape(-1, 2)
    out = np.zeros((len(pos), 12), dtype=np.float64)
    lib.tpl_project(_ptr(pts), len(pts), _ptr(pos), len(pos),
                    int(bool(closed)), _ptr(out))
    return out


def rampify_profile(v0, a0, lim_v, a_min, a_max, j_min, j_max, v_min, step):
    lib = get_lib()
    if lib is None:
        return None
    lim = np.ascontiguousarray(lim_v, dtype=np.float64)
    out = np.zeros((len(lim), 2), dtype=np.float64)
    lib.tpl_rampify_profile(
        float(v0 if v0 is not None else 0.0),
        float(a0 if a0 is not None else 0.0),
        int(v0 is not None), int(a0 is not None),
        _ptr(lim), len(lim),
        float(a_min), float(a_max), float(j_min), float(j_max),
        float(v_min), float(step), _ptr(out))
    return out


def rampify_corridor(step, horizon, sharpness, proj_distance, path, gap,
                     lower, upper):
    lib = get_lib()
    if lib is None:
        return None
    path_v = np.ascontiguousarray(path[:, 5], dtype=np.float64)
    lo = np.ascontiguousarray(lower, dtype=np.float64)
    up = np.ascontiguousarray(upper, dtype=np.float64)
    out = np.zeros(len(path_v), dtype=np.float64)
    lib.tpl_rampify_corridor(
        float(step), int(horizon), float(sharpness), float(proj_distance),
        _ptr(path_v), len(path_v), float(gap), _ptr(lo), _ptr(up), _ptr(out))
    return out
