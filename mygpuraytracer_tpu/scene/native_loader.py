"""ctypes bindings for the native OBJ loader (native/objload.cpp).

Loads ``native/libmygpurt_native.so`` if present (``make -C native``);
callers fall back to the pure-Python parser otherwise. The native path also
Morton-orders triangles so the chunk-streamed intersector sees spatially
coherent face chunks.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "native", "libmygpurt_native.so"),
        os.path.join(os.path.dirname(__file__), "libmygpurt_native.so"),
    ]
    for c in candidates:
        if os.path.isfile(c):
            return c
    return None


def get_native_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.obj_parse.restype = ctypes.c_long
    lib.obj_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.obj_free_buffers.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return _LIB


def native_parse_obj(path: str, morton_order: bool = True):
    """Parse an OBJ natively. Returns (tri_pos [n,3,3], tri_uv [n,3,2],
    aabb_min [3], aabb_max [3]) or None if the native lib is unavailable."""
    lib = get_native_lib()
    if lib is None:
        return None
    tri_pos = ctypes.POINTER(ctypes.c_float)()
    tri_uv = ctypes.POINTER(ctypes.c_float)()
    mn = (ctypes.c_float * 3)()
    mx = (ctypes.c_float * 3)()
    n = lib.obj_parse(
        path.encode(), int(morton_order),
        ctypes.byref(tri_pos), ctypes.byref(tri_uv), mn, mx,
    )
    if n < 0:
        return None
    try:
        pos = np.ctypeslib.as_array(tri_pos, shape=(n, 3, 3)).copy() if n else np.zeros((0, 3, 3), np.float32)
        uv = np.ctypeslib.as_array(tri_uv, shape=(n, 3, 2)).copy() if n else np.zeros((0, 3, 2), np.float32)
    finally:
        lib.obj_free_buffers(tri_pos, tri_uv)
    return pos, uv, np.array(mn[:], np.float32), np.array(mx[:], np.float32)
