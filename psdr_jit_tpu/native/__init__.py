"""ctypes bindings for the native host-ops library.

Compiles ``hostops.cpp`` with the system toolchain on first use (cached next
to the source).  The geometry entry points (Morton ordering, edge building,
OBJ parsing) have pure-numpy fallbacks so the package works without a
compiler; EXR read/write is native-only and raises without one (use the
PFM/NPY codecs in ``utils.image`` as the portable alternative).
``available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hostops.cpp")
_SO = os.path.join(_HERE, "libhostops.so")

_lib = None
_tried = False
_lock = threading.Lock()


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO, "-lz",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_SO)
        except Exception:
            _lib = None
            return None

        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_f32p = ctypes.POINTER(ctypes.c_float)

        lib.morton_order.argtypes = [c_f32p, ctypes.c_int64, c_i32p]
        lib.build_edge_list.restype = ctypes.c_int64
        lib.build_edge_list.argtypes = [c_i32p, ctypes.c_int64, c_i32p]

        lib.obj_parse.restype = ctypes.c_void_p
        lib.obj_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        for fn in ("obj_num_vertices", "obj_num_uvs", "obj_num_faces"):
            getattr(lib, fn).restype = ctypes.c_int64
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        lib.obj_has_uv.restype = ctypes.c_int32
        lib.obj_has_uv.argtypes = [ctypes.c_void_p]
        lib.obj_copy.argtypes = [ctypes.c_void_p, c_f32p, c_f32p, c_i32p, c_i32p]
        lib.obj_free.argtypes = [ctypes.c_void_p]

        lib.exr_load.restype = ctypes.c_void_p
        lib.exr_load.argtypes = [ctypes.c_char_p]
        for fn in ("exr_width", "exr_height", "exr_num_channels"):
            getattr(lib, fn).restype = ctypes.c_int32
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        lib.exr_error.restype = ctypes.c_char_p
        lib.exr_error.argtypes = [ctypes.c_void_p]
        lib.exr_channel_name.restype = ctypes.c_char_p
        lib.exr_channel_name.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.exr_copy.argtypes = [ctypes.c_void_p, c_f32p]
        lib.exr_free.argtypes = [ctypes.c_void_p]
        lib.exr_save.restype = ctypes.c_int32
        lib.exr_save.argtypes = [
            ctypes.c_char_p, c_f32p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.exr_save_ex.restype = ctypes.c_int32
        lib.exr_save_ex.argtypes = [
            ctypes.c_char_p, c_f32p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


# ---------------------------------------------------------------------------
# Morton order
# ---------------------------------------------------------------------------

def morton_order(centroids: np.ndarray) -> np.ndarray:
    """Permutation of triangle indices by 30-bit Morton code of centroids."""
    c = np.ascontiguousarray(centroids, np.float32)
    n = c.shape[0]
    lib = _load()
    if lib is not None:
        out = np.empty(n, np.int32)
        lib.morton_order(_f32p(c), n, _i32p(out))
        return out
    # numpy fallback
    lo = c.min(0)
    ext = np.maximum(c.max(0) - lo, 1e-30)
    q = np.clip(((c - lo) / ext * 1023.0), 0, 1023).astype(np.uint32)

    def expand(v):
        v = (v * 0x00010001) & 0xFF0000FF
        v = (v * 0x00000101) & 0x0F00F00F
        v = (v * 0x00000011) & 0xC30C30C3
        v = (v * 0x00000005) & 0x49249249
        return v

    code = (expand(q[:, 0]) << 2) | (expand(q[:, 1]) << 1) | expand(q[:, 2])
    return np.argsort(code, kind="stable").astype(np.int32)


# ---------------------------------------------------------------------------
# Edge list
# ---------------------------------------------------------------------------

def build_edge_list(faces: np.ndarray):
    """(F,3) int32 faces -> (E,5) int32 edge rows, or None to use fallback."""
    lib = _load()
    if lib is None:
        return None
    f = np.ascontiguousarray(faces, np.int32)
    nf = f.shape[0]
    out = np.empty((3 * max(nf, 1), 5), np.int32)
    ne = lib.build_edge_list(_i32p(f), nf, _i32p(out))
    return out[:ne].copy()


# ---------------------------------------------------------------------------
# OBJ
# ---------------------------------------------------------------------------

def parse_obj(text: bytes):
    """Parse OBJ text; returns dict like utils.obj.load_obj or None."""
    lib = _load()
    if lib is None:
        return None
    handle = lib.obj_parse(text, len(text))
    try:
        nv = lib.obj_num_vertices(handle)
        nt = lib.obj_num_uvs(handle)
        nf = lib.obj_num_faces(handle)
        has_uv = bool(lib.obj_has_uv(handle))
        verts = np.empty((nv, 3), np.float32)
        uvs = np.empty((max(nt, 1), 2), np.float32)
        faces = np.empty((max(nf, 1), 3), np.int32)
        face_uvs = np.empty((max(nf, 1), 3), np.int32)
        lib.obj_copy(handle, _f32p(verts), _f32p(uvs), _i32p(faces),
                     _i32p(face_uvs))
    finally:
        lib.obj_free(handle)
    return {
        "vertices": verts,
        "faces": faces[:nf],
        "uvs": uvs[:nt] if (nt and has_uv) else None,
        "face_uvs": face_uvs[:nf] if (nt and has_uv) else None,
    }


# ---------------------------------------------------------------------------
# EXR
# ---------------------------------------------------------------------------

def read_exr(path: str) -> np.ndarray:
    """Read a scanline EXR -> (H, W, C) float32 in R,G,B(,A) order."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native hostops unavailable; cannot read EXR")
    h = lib.exr_load(path.encode())
    try:
        err = lib.exr_error(h).decode()
        if err:
            raise ValueError(f"EXR read failed for {path!r}: {err}")
        w = lib.exr_width(h)
        ht = lib.exr_height(h)
        nc = lib.exr_num_channels(h)
        data = np.empty((ht, w, nc), np.float32)
        lib.exr_copy(h, _f32p(data))
        names = [lib.exr_channel_name(h, i).decode() for i in range(nc)]
    finally:
        lib.exr_free(h)
    # reorder disk channels (alphabetical, e.g. B,G,R) to R,G,B(,A)
    want = [n for n in ("R", "G", "B", "A") if n in names]
    if len(want) == len(names) and want:
        order = [names.index(n) for n in want]
        data = data[..., order]
    return data


def write_exr(path: str, img: np.ndarray, compression: str = "zip") -> None:
    """Write a scanline EXR; ``compression`` is ``"zip"`` or ``"piz"``."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native hostops unavailable; cannot write EXR")
    comp = {"zip": 3, "piz": 4}[compression]
    img = np.ascontiguousarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    rc = lib.exr_save_ex(path.encode(), _f32p(img), w, h, c, comp)
    if rc != 0:
        raise ValueError(f"EXR write failed ({rc}) for {path!r}")
