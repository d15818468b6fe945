"""ctypes bindings for the native host tier (native/evomotion_host.cpp).

Loads libevomotion_host.so when built (``make -C native``); every entry point
has a pure-Python fallback so the framework works without the native build.
Use :func:`available` to check, :func:`build` to compile in-tree.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libevomotion_host.so")

_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.em_float_to_bits.restype = ctypes.c_uint32
        lib.em_float_to_bits.argtypes = [ctypes.c_float]
        lib.em_bits_to_float.restype = ctypes.c_float
        lib.em_bits_to_float.argtypes = [ctypes.c_uint32]
        lib.em_mt19937_create.restype = ctypes.c_void_p
        lib.em_mt19937_create.argtypes = [ctypes.c_uint32]
        lib.em_mt19937_destroy.argtypes = [ctypes.c_void_p]
        lib.em_mt19937_next.restype = ctypes.c_uint32
        lib.em_mt19937_next.argtypes = [ctypes.c_void_p]
        lib.em_mt19937_uniform.restype = ctypes.c_float
        lib.em_mt19937_uniform.argtypes = [ctypes.c_void_p]
        lib.em_mt19937_uniform_fill.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int
        ]
        lib.em_parse_obj_vertices.restype = ctypes.c_int
        lib.em_parse_obj_vertices.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int
        ]
        lib.em_reduce_hull.restype = ctypes.c_int
        lib.em_reduce_hull.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.em_greedy_color.restype = ctypes.c_int
        lib.em_greedy_color.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def build() -> bool:
    """Compile the native library in-tree (g++, see native/Makefile)."""
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    except Exception:
        return False
    global _lib
    _lib = None
    return available()


# --- typed wrappers (native with Python fallback) --------------------------


def float_to_bits(f: float) -> int:
    lib = _load()
    if lib is not None:
        return int(lib.em_float_to_bits(ctypes.c_float(f)))
    return int(np.float32(f).view(np.uint32))


def bits_to_float(b: int) -> float:
    lib = _load()
    if lib is not None:
        return float(lib.em_bits_to_float(ctypes.c_uint32(b)))
    return float(np.uint32(b).view(np.float32))


class NativeMT19937:
    """std::mt19937 + uniform-float stream backed by the native lib."""

    def __init__(self, seed: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (run native.build())")
        self._lib = lib
        self._gen = lib.em_mt19937_create(ctypes.c_uint32(seed))

    def next_u32(self) -> int:
        return int(self._lib.em_mt19937_next(self._gen))

    def uniform_float(self) -> float:
        return float(self._lib.em_mt19937_uniform(self._gen))

    def uniform_fill(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.float32)
        self._lib.em_mt19937_uniform_fill(
            self._gen, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
        )
        return out

    def __del__(self):
        try:
            self._lib.em_mt19937_destroy(self._gen)
        except Exception:
            pass


def parse_obj_vertices(path: str, cap: int = 65536) -> np.ndarray:
    lib = _load()
    if lib is None:
        from ..physics.shapes import parse_obj

        return parse_obj(path)[0]
    buf = np.empty((cap, 3), dtype=np.float32)
    n = lib.em_parse_obj_vertices(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap
    )
    if n < 0:
        raise FileNotFoundError(path)
    verts = buf[: min(n, cap)]
    return np.unique(verts, axis=0)


def reduce_hull(points: np.ndarray, max_verts: int = 48) -> np.ndarray:
    lib = _load()
    if lib is None:
        from ..physics.shapes import reduce_to_hull

        return reduce_to_hull(points, max_verts)
    pts = np.ascontiguousarray(points, dtype=np.float32)
    out = np.empty((max(len(pts), max_verts), 3), dtype=np.float32)
    n = lib.em_reduce_hull(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts), max_verts,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out[:n].copy()


def greedy_color(n_blocks: int, edges: np.ndarray) -> tuple[np.ndarray, int]:
    """Returns (colors [n_blocks], n_colors)."""
    lib = _load()
    edges = np.ascontiguousarray(edges, dtype=np.int32).reshape(-1, 2)
    if lib is None:
        adj = [[] for _ in range(n_blocks)]
        for a, b in edges:
            adj[a].append(b)
            adj[b].append(a)
        colors = np.full(n_blocks, -1, dtype=np.int32)
        n_colors = 0
        for b in range(n_blocks):
            used = {colors[nb] for nb in adj[b] if colors[nb] >= 0}
            c = 0
            while c in used:
                c += 1
            colors[b] = c
            n_colors = max(n_colors, c + 1)
        return colors, n_colors
    colors = np.full(n_blocks, -1, dtype=np.int32)
    n_colors = lib.em_greedy_color(
        n_blocks, edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(edges),
        colors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return colors, int(n_colors)
