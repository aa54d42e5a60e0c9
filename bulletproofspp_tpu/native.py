"""Loader for the native host library (native/bppp_native.cpp).

Builds the shared object on demand with g++ and exposes the scalar
pipeline via ctypes.  The build artifact is keyed on a content hash of
the source (bppp_native-<sha256 prefix>.so): a stale or tampered binary
can never be picked up after a source change, and no opaque binary is
ever committed (native/*.so is gitignored).  Falls back to the
pure-Python implementation in ops.glv when the toolchain is unavailable.

GLV quotient slack: the C++ split computes the lattice quotients with
two-stage rounding (precomputed 384-bit reciprocals g1/g2, then
round(k*g / 2^384)), which may differ by +-1 from Python glv.split's
exact round(b2*k/det) for scalars within 2^-128 of a rounding boundary.
Every decomposition remains valid (k1 + k2*lambda == k mod R always) and
the digit recoding uses ROWS=33 signed base-16 rows covering |k_i| <
2^130 — far above the |k_i| <~ 2^128.2 (max |v1|,|v2| Babai bound + 1
quotient slack) either path can produce — so MSM results are identical;
only the (k1, k2) pair itself may differ from the Python fallback on
boundary scalars.  The randomized equivalence fuzz in
tests/test_native.py exercises typical scalars; boundary cases are
covered by the bound argument above, not by the fuzz.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_lib = None
_lock = threading.Lock()
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native", "bppp_native.cpp")

ROWS = 33


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so = os.path.join(os.path.dirname(_SRC), f"bppp_native-{tag}.so")
    if os.path.exists(so):
        return so
    try:
        tmp = so + f".tmp.{os.getpid()}"
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, so)  # atomic: concurrent builders race benignly
        return so
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
