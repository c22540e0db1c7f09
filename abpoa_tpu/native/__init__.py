"""Native (C) host-side graph kernels, loaded via ctypes.

Compiled on first import with the system compiler into the package dir
(one-time, ~a second). Set ABPOA_NO_NATIVE=1 to force the pure-Python
fallbacks in graph.py (used by the equivalence tests).
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_SO = _DIR / "_hostgraph.so"
_SRC = _DIR / "hostgraph.c"

_lib = None


def _build():
    # compile to a temp file and rename: concurrent importers must never
    # dlopen a half-written library
    cc = os.environ.get("CC", "cc")
    tmp = _SO.with_suffix(f".tmp.{os.getpid()}.so")
    subprocess.run([cc, "-O2", "-shared", "-fPIC", "-o", str(tmp),
                    str(_SRC)], check=True, capture_output=True)
    os.replace(tmp, _SO)


def get_lib():
    """Returns the loaded library or None (disabled / build failed)."""
    global _lib
    if _lib is not None:
        return _lib or None
    if os.environ.get("ABPOA_NO_NATIVE"):
        _lib = False
        return None
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_SO))
        i32p = ctypes.POINTER(ctypes.c_int32)
        for name, nargs in (("topo_sort", 7), ("set_remain", 7),
                            ("msa_rank", 6)):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [ctypes.c_int32] + [i32p] * nargs
        _lib = lib
    except Exception:
        _lib = False
        return None
    return _lib


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def topo_sort(n, out_flat, out_off, in_cnt, aligned_flat, aligned_off):
    lib = get_lib()
    i2n = np.empty(n, dtype=np.int32)
    n2i = np.empty(n, dtype=np.int32)
    rc = lib.topo_sort(n, _p(out_flat), _p(out_off), _p(in_cnt),
                       _p(aligned_flat), _p(aligned_off), _p(i2n), _p(n2i))
    if rc != 0:
        raise RuntimeError("Failed to set node index.")
    return i2n, n2i


def set_remain(n, out_flat, out_off, out_w_flat, in_flat, in_off, out_cnt):
    lib = get_lib()
    remain = np.zeros(n, dtype=np.int32)
    rc = lib.set_remain(n, _p(out_flat), _p(out_off), _p(out_w_flat),
                        _p(in_flat), _p(in_off), _p(out_cnt), _p(remain))
    if rc != 0:
        raise RuntimeError("Failed to set node remain.")
    return remain


def msa_rank(n, out_flat, out_off, in_cnt, aligned_flat, aligned_off):
    lib = get_lib()
    rank = np.empty(n, dtype=np.int32)
    rc = lib.msa_rank(n, _p(out_flat), _p(out_off), _p(in_cnt),
                      _p(aligned_flat), _p(aligned_off), _p(rank))
    if rc != 0:
        raise RuntimeError("Error in set_msa_rank.")
    return rank
