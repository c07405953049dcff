"""ctypes bindings for the native runtime (mcpt_native.cpp).

Auto-builds `libmcpt_native.so` with g++ on first import if it is missing or
stale; every entry point has a pure-Python fallback (io/obj.py, bvh.py), so
the package works without a toolchain — the native path is the production
one for large assets (20x+ faster OBJ parse / BVH build on the chess set).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mcpt_native.cpp")
_LIB = os.path.join(_DIR, "libmcpt_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True,
            capture_output=True,
            timeout=240,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if (not os.path.exists(_LIB)) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.obj_load.restype = ctypes.c_long
        lib.obj_load.argtypes = [ctypes.c_char_p]
        lib.obj_fill.restype = None
        lib.bvh_build.restype = ctypes.c_long
        lib.bvh_build.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.bvh_prim_count.restype = ctypes.c_long
        lib.bvh_fill.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def obj_load_native(path):
    """Same contract as io.obj.load_obj; None if the native lib is absent."""
    lib = _load()
    if lib is None:
        return None
    n = lib.obj_load(str(path).encode())
    if n < 0:
        raise FileNotFoundError(path)
    positions = np.empty((n, 3, 3), np.float32)
    texcoords = np.empty((n, 3, 2), np.float32)
    normals = np.empty((n, 3, 3), np.float32)
    lib.obj_fill(
        positions.ctypes.data_as(ctypes.c_void_p),
        texcoords.ctypes.data_as(ctypes.c_void_p),
        normals.ctypes.data_as(ctypes.c_void_p),
    )
    return {"positions": positions, "texcoords": texcoords, "normals": normals}


def bvh_build_native(aabb_min, aabb_max, leaf_size=4, method="sah", sah_bins=16):
    """Same contract as bvh.build_bvh; None if the native lib is absent."""
    lib = _load()
    if lib is None:
        return None
    from mcpt_tpu.bvh import FlatBVH

    mn = np.ascontiguousarray(aabb_min, np.float32)
    mx = np.ascontiguousarray(aabb_max, np.float32)
    n = mn.shape[0]
    if n == 0:
        from mcpt_tpu.bvh import build_bvh

        return build_bvh(mn, mx, leaf_size=leaf_size, method=method)
    nn = lib.bvh_build(
        mn.ctypes.data_as(ctypes.c_void_p),
        mx.ctypes.data_as(ctypes.c_void_p),
        n,
        leaf_size,
        1 if method == "sah" else 0,
        sah_bins,
    )
    p = lib.bvh_prim_count()
    node_min = np.empty((nn, 3), np.float32)
    node_max = np.empty((nn, 3), np.float32)
    node_miss = np.empty(nn, np.int32)
    leaf_start = np.empty(nn, np.int32)
    leaf_count = np.empty(nn, np.int32)
    prim_ids = np.empty(p, np.int32)
    lib.bvh_fill(
        node_min.ctypes.data_as(ctypes.c_void_p),
        node_max.ctypes.data_as(ctypes.c_void_p),
        node_miss.ctypes.data_as(ctypes.c_void_p),
        leaf_start.ctypes.data_as(ctypes.c_void_p),
        leaf_count.ctypes.data_as(ctypes.c_void_p),
        prim_ids.ctypes.data_as(ctypes.c_void_p),
    )
    return FlatBVH(
        node_min=node_min,
        node_max=node_max,
        node_miss=node_miss,
        leaf_start=leaf_start,
        leaf_count=leaf_count,
        prim_ids=prim_ids,
    )
