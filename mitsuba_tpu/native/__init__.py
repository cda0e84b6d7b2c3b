"""ctypes bindings for the native runtime components (native/src/*.cpp):
mesh IO (OBJ/PLY) and the binned-SAH threaded-BVH builder.

The shared library is built on demand with g++ (no pybind11 in this image;
the C ABI + ctypes keeps the binding dependency-free)."""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmtpu_native.so")
_SRC = os.path.join(_DIR, "..", "..", "native")

_lib = None


def _build():
    subprocess.run(["make", "-C", _SRC], check=True, capture_output=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        _build()
    lib = ctypes.CDLL(_SO)

    fpp = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))
    ipp = ctypes.POINTER(ctypes.POINTER(ctypes.c_int))
    ip = ctypes.POINTER(ctypes.c_int)

    for name in ("mtpu_load_obj", "mtpu_load_ply"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_char_p, fpp, ip, ipp, ip, fpp, ip, fpp, ip]
    lib.mtpu_build_bvh.restype = ctypes.c_int
    lib.mtpu_build_bvh.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, fpp, ip, ipp,
    ]
    lib.mtpu_build_bvh_wide.restype = ctypes.c_int
    lib.mtpu_build_bvh_wide.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, fpp, ip, ipp,
    ]
    lib.mtpu_free.restype = None
    lib.mtpu_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _take_f32(lib, ptr, count):
    arr = np.ctypeslib.as_array(ptr, shape=(count,)).copy()
    lib.mtpu_free(ctypes.cast(ptr, ctypes.c_void_p))
    return arr


def _take_i32(lib, ptr, count):
    arr = np.ctypeslib.as_array(ptr, shape=(count,)).copy()
    lib.mtpu_free(ctypes.cast(ptr, ctypes.c_void_p))
    return arr


def _load_mesh(fn_name, path):
    lib = get_lib()
    verts = ctypes.POINTER(ctypes.c_float)()
    faces = ctypes.POINTER(ctypes.c_int)()
    normals = ctypes.POINTER(ctypes.c_float)()
    uvs = ctypes.POINTER(ctypes.c_float)()
    nv = ctypes.c_int()
    nf = ctypes.c_int()
    has_n = ctypes.c_int()
    has_uv = ctypes.c_int()
    rc = getattr(lib, fn_name)(
        str(path).encode(), ctypes.byref(verts), ctypes.byref(nv),
        ctypes.byref(faces), ctypes.byref(nf), ctypes.byref(normals),
        ctypes.byref(has_n), ctypes.byref(uvs), ctypes.byref(has_uv),
    )
    if rc != 0:
        raise IOError(f"{fn_name}({path!r}) failed with code {rc}")
    out = {
        "vertices": _take_f32(lib, verts, nv.value * 3).reshape(-1, 3),
        "faces": _take_i32(lib, faces, nf.value * 3).reshape(-1, 3),
    }
    if has_n.value:
        out["normals"] = _take_f32(lib, normals, nv.value * 3).reshape(-1, 3)
    if has_uv.value:
        out["uvs"] = _take_f32(lib, uvs, nv.value * 2).reshape(-1, 2)
    return out


def load_obj(path):
    """Native OBJ loader (reference: src/shapes/obj.cpp)."""
    return _load_mesh("mtpu_load_obj", path)


def load_ply(path):
    """Native PLY loader, ascii + binary_little_endian
    (reference: src/shapes/ply.cpp)."""
    return _load_mesh("mtpu_load_ply", path)


def build_bvh(tris):
    """Binned-SAH threaded BVH over [T, 9] (v0|e1|e2) triangles.

    Returns (nodes [M, 8] float32 with bitcast int links in cols 6-7,
    prim_order [T] int32).  Layout documented in native/src/bvh.cpp."""
    lib = get_lib()
    tris = np.ascontiguousarray(tris, np.float32)
    t_ptr = tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    nodes = ctypes.POINTER(ctypes.c_float)()
    order = ctypes.POINTER(ctypes.c_int)()
    n_nodes = ctypes.c_int()
    rc = lib.mtpu_build_bvh(
        t_ptr, tris.shape[0], ctypes.byref(nodes), ctypes.byref(n_nodes),
        ctypes.byref(order),
    )
    if rc != 0:
        raise RuntimeError(f"mtpu_build_bvh failed with code {rc}")
    nd = _take_f32(lib, nodes, n_nodes.value * 8).reshape(-1, 8)
    po = _take_i32(lib, order, tris.shape[0])
    return nd, po


def build_bvh_wide(tris, max_leaf=64):
    """Wide-leaf binned-SAH threaded BVH (leaf payload = start << 8 | count,
    count <= max_leaf) feeding the Pallas block-traversal kernel
    (mitsuba_tpu/ops/bvh_sweep.py).  Same return contract as build_bvh."""
    lib = get_lib()
    tris = np.ascontiguousarray(tris, np.float32)
    t_ptr = tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    nodes = ctypes.POINTER(ctypes.c_float)()
    order = ctypes.POINTER(ctypes.c_int)()
    n_nodes = ctypes.c_int()
    rc = lib.mtpu_build_bvh_wide(
        t_ptr, tris.shape[0], int(max_leaf), ctypes.byref(nodes),
        ctypes.byref(n_nodes), ctypes.byref(order),
    )
    if rc != 0:
        raise RuntimeError(f"mtpu_build_bvh_wide failed with code {rc}")
    nd = _take_f32(lib, nodes, n_nodes.value * 8).reshape(-1, 8)
    po = _take_i32(lib, order, tris.shape[0])
    return nd, po
