"""ctypes bindings for the native graph-builder runtime (graphbuild.cpp).

The shared library builds on first use with the system compiler (g++ -O3)
and is cached next to the source. Every entry point has a pure-numpy
fallback in data/graph.py and data/synthetic.py, so the framework works
without a toolchain; the native path is the production builder for
RMAT-scale graphs (100M edges).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "graphbuild.cpp"
_LIB = _HERE / "libgraphbuild.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           str(_SRC), "-o", str(_LIB)]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        logger.warning("native build unavailable: %s", e)
        return False
    if r.returncode != 0:
        logger.warning("native build failed:\n%s", r.stderr[-2000:])
        return False
    return True


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as e:
            logger.warning("failed to load native lib: %s", e)
            return None

        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.gb_build_rel_graph.restype = ctypes.c_int32
        lib.gb_build_rel_graph.argtypes = [
            i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, i64p, i32p, i32p, i32p, i32p, f32p,
            ctypes.c_int32, f32p, f32p]
        lib.gb_count_buckets.restype = ctypes.c_int64
        lib.gb_count_buckets.argtypes = [
            i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, i64p]
        lib.gb_rmat.restype = None
        lib.gb_rmat.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            i64p, i64p, i64p]
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def native_available() -> bool:
    return get_lib() is not None


def build_rel_graph_native(src, dst, rel, num_nodes: int, num_relations: int,
                           caps, *, norm_mode: str = "dense"):
    """Native bucket/sort/pad/degree computation.

    Returns a dict of numpy arrays matching the RelGraph layout (see
    data/graph.py), or None when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    rel = np.ascontiguousarray(rel, np.int64)
    caps = np.ascontiguousarray(caps, np.int64)
    total = int(caps.sum())
    src_pad = np.empty(total, np.int32)
    dst_pad = np.empty(total, np.int32)
    t_src_pad = np.empty(total, np.int32)
    t_dst_pad = np.empty(total, np.int32)
    edge_norm = 1 if norm_mode == "edge" else 0
    dummy = np.zeros(1, np.float32)  # keep alive for the call duration
    if edge_norm:
        inv_deg = np.zeros((0, 0), np.float32)
        edge_scale = np.empty(total, np.float32)
        t_edge_scale = np.empty(total, np.float32)
        inv_buf = dummy
    else:
        inv_deg = np.empty((num_relations, num_nodes + 1), np.float32)
        edge_scale = np.zeros(0, np.float32)
        t_edge_scale = np.zeros(0, np.float32)
        inv_buf = inv_deg
    inv_ptr = _ptr(inv_buf, ctypes.c_float)
    scale_buf = edge_scale if edge_norm else dummy
    t_scale_buf = t_edge_scale if edge_norm else dummy
    rc = lib.gb_build_rel_graph(
        _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64),
        _ptr(rel, ctypes.c_int64), len(src), num_nodes, num_relations,
        _ptr(caps, ctypes.c_int64), _ptr(src_pad, ctypes.c_int32),
        _ptr(dst_pad, ctypes.c_int32), _ptr(t_src_pad, ctypes.c_int32),
        _ptr(t_dst_pad, ctypes.c_int32), inv_ptr,
        ctypes.c_int32(edge_norm), _ptr(scale_buf, ctypes.c_float),
        _ptr(t_scale_buf, ctypes.c_float))
    if rc != 0:
        raise ValueError(f"native graph build failed (rc={rc}): "
                         "bucket capacity smaller than bucket size")
    return {"src_pad": src_pad, "dst_pad": dst_pad, "t_src_pad": t_src_pad,
            "t_dst_pad": t_dst_pad, "inv_deg": inv_deg,
            "edge_scale": edge_scale, "t_edge_scale": t_edge_scale}


def rmat_native(num_nodes: int, num_edges: int, num_relations: int,
                seed: int = 0, a: float = 0.57, b: float = 0.19,
                c: float = 0.19):
    """Parallel native R-MAT generation; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.empty(num_edges, np.int64)
    dst = np.empty(num_edges, np.int64)
    rel = np.empty(num_edges, np.int64)
    lib.gb_rmat(num_nodes, num_edges, num_relations, seed, a, b, c,
                _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64),
                _ptr(rel, ctypes.c_int64))
    return {"src": src, "dst": dst, "rel": rel, "num_nodes": num_nodes,
            "num_relations": num_relations}
