"""Loader for the native host library (native/bppp_native.cpp).

Builds the shared object on demand with g++ (cached next to the source)
and exposes the scalar pipeline via ctypes.  Falls back to the pure-Python
implementation in ops.glv when the toolchain or binary is unavailable —
outputs are bit-identical (tested in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lib = None
_lock = threading.Lock()
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native", "bppp_native.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "bppp_native.so")

ROWS = 33


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO
    except Exception:
        return None


def _pack_u64(v: int, limbs: int) -> np.ndarray:
    return np.frombuffer(int(v).to_bytes(8 * limbs, "little"), dtype="<u8").copy()


def get_lib():
    """The initialized ctypes library, or None (use the Python fallback)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("BPPP_NO_NATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.glv_init.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.glv_recode_batch.restype = ctypes.c_int
        lib.recode_signed_one.restype = ctypes.c_int

        # initialize the GLV lattice parameters from the Python derivation
        from .ops import glv as pyglv
        from .core.fields import R

        (a1, b1), (a2, b2) = pyglv._V1, pyglv._V2
        det = a1 * b2 - a2 * b1
        assert det > 0
        vecs = [a1, b1, a2, b2]
        signs = np.array([1 if v >= 0 else -1 for v in vecs], dtype=np.int64)
        mags = np.concatenate([_pack_u64(abs(v), 3) for v in vecs])
        g1 = ((abs(b2) << 384) + det // 2) // det
        g2 = ((abs(b1) << 384) + det // 2) // det
        g1_sign = 1 if b2 >= 0 else -1
        g2_sign = -1 if b1 >= 0 else 1  # g2 approximates -b1/det
        lib.glv_init(
            signs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            mags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            g1_sign,
            _pack_u64(g1, 5).ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            g2_sign,
            _pack_u64(g2, 5).ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        )
        _lib = lib
    return _lib


def glv_recode_batch(scalars) -> tuple[np.ndarray, np.ndarray] | None:
    """list[int] (canonical mod R) -> (absd, sgn) of shape (ROWS, 2n) in
    the engine's interleaved [k1_i, k2_i] lane order; None if the native
    library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(scalars)
    buf = np.empty((n, 4), dtype="<u8")
    for i, s in enumerate(scalars):
        buf[i] = np.frombuffer(int(s).to_bytes(32, "little"), dtype="<u8")
    absd = np.empty((ROWS, 2 * n), dtype=np.uint32)
    sgn = np.empty((ROWS, 2 * n), dtype=np.uint32)
    rc = lib.glv_recode_batch(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n,
        absd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        sgn.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    if rc != 0:
        return None
    return absd, sgn


def recode_signed(v: int) -> tuple[np.ndarray, np.ndarray] | None:
    lib = get_lib()
    if lib is None:
        return None
    absd = np.empty(ROWS, dtype=np.uint32)
    sgn = np.empty(ROWS, dtype=np.uint32)
    rc = lib.recode_signed_one(
        -1 if v < 0 else 1,
        _pack_u64(abs(v), 4).ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        absd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        sgn.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    if rc != 0:
        return None
    return absd, sgn
