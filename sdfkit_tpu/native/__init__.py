"""Native (C++) host kernels, loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; the host runtime around it — here the
marching-cubes sparse phase's welding and normal accumulation — is C++
(sparse_phase.cc), compiled on first use with the system g++ into a cached
shared library next to the source (no pybind11 in this image; plain C ABI +
numpy ctypes pointers). Everything degrades gracefully: if no compiler is
available the numpy implementations in mesh/marching_cubes.py are used and
results stay correct (welding is bitwise-identical either way).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "sparse_phase.cc")
_LIB = os.path.join(_DIR, "_sparse_phase.so")


def _build() -> str | None:
    """Compile the shared library if missing or stale; None on failure."""
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            # Per-process tmp name + atomic rename: concurrent first-use
            # builds (pytest workers, bench + tests) each compile their own
            # file and the last rename wins with a complete library.
            tmp = f"{_LIB}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                 "-o", tmp],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, _LIB)
        return _LIB
    except Exception:
        return None


def _load():
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.weld_i64.restype = ctypes.c_int64
        lib.weld_i64.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.grad_edges.restype = None
        lib.grad_edges.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_double, ctypes.c_void_p,
        ]
        return lib
    except OSError:
        return None


_lib = _load()


def available() -> bool:
    return _lib is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def weld(keys: np.ndarray):
    """Vertex welding (see sparse_phase.cc weld_i64). Returns
    (vertex_id int64 (n,), rep int64 (n_verts,)) — bitwise identical to the
    numpy np.unique + first-occurrence-rank chain."""
    keys = np.ascontiguousarray(keys, np.int64)
    n = keys.shape[0]
    vertex_id = np.empty(n, np.int32)
    rep = np.empty(n, np.int64)  # upper bound; trimmed below
    n_verts = _lib.weld_i64(_ptr(keys), n, _ptr(vertex_id), _ptr(rep))
    return vertex_id.astype(np.int64), rep[:n_verts]


def grad_edges(evi, ecell, vid, v8, vg, normals, eps: float) -> None:
    """Accumulate edge-vertex gradient contributions into ``normals``
    (float32 (n_verts, 3)), in place. See sparse_phase.cc grad_edges."""
    from sdfkit_tpu.mesh import luts

    evi = np.ascontiguousarray(evi, np.uint8)
    ecell = np.ascontiguousarray(ecell, np.int64)
    vid = np.ascontiguousarray(vid, np.int32)
    v8 = np.ascontiguousarray(v8, np.float64)
    vg = np.ascontiguousarray(vg, np.float32)
    assert normals.dtype == np.float32 and normals.flags.c_contiguous
    p1 = np.ascontiguousarray(luts.EDGE_P1, np.int8)
    p2 = np.ascontiguousarray(luts.EDGE_P2, np.int8)
    mc1 = np.ascontiguousarray(luts.EDGE_MC1, np.int8)
    mc2 = np.ascontiguousarray(luts.EDGE_MC2, np.int8)
    _lib.grad_edges(
        _ptr(evi), _ptr(ecell), _ptr(vid), evi.shape[0],
        _ptr(v8), _ptr(vg), v8.shape[1],
        _ptr(p1), _ptr(p2), _ptr(mc1), _ptr(mc2),
        ctypes.c_double(eps), _ptr(normals),
    )
