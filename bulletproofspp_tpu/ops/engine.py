"""JaxEngine: the TPU execution engine for the protocol layer.

Implements the three hot EC primitives of ``core.engine``
(msm / fold_bases / shared_mul) on top of the vectorized kernels in
ops.msm.  Host work per call is limited to exact-integer GLV splitting and
digit recoding (ops.glv) plus limb packing; all field/curve arithmetic runs
on device.  Shapes are padded to power-of-two lane buckets so ``jax.jit``
caches one executable per bucket.

Identical outputs to ``core.engine.HostEngine`` by construction (exact
modular arithmetic end to end) — tested in tests/test_ops_engine.py.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..core import ec
from ..core.engine import HostEngine
from ..core.fields import Q, R
from .. import metrics
from . import curve, glv, limb, msm


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _endo_host(pt):
    return (ec.BETA * pt[0] % Q, pt[1])


def _msm_lanes(flt):
    """(scalar, point) pairs -> GLV-split digit arrays (ROWS, 2n) plus the
    interleaved [P_i, phi(P_i)] lane point list.  Uses the native scalar
    pipeline (bulletproofspp_tpu.native) when available."""
    from .. import native

    lanes_pts = []
    for _, p in flt:
        lanes_pts.append(p)
        lanes_pts.append(_endo_host(p))
    nat = native.glv_recode_batch([s for s, _ in flt])
    if nat is not None:
        absd, sgn = nat
    else:
        halves = []
        for s, _ in flt:
            k1, k2 = glv.split(s)
            halves += [k1, k2]
        absd, sgn = glv.recode_batch(halves)
    return absd, sgn, lanes_pts


class JaxEngine:
    """Device-backed engine.  ``host_below``: lane-count threshold under
    which calls fall back to the exact host engine (dispatch+transfer
    overhead dominates tiny MSMs; 0 = always device)."""

    def __init__(self, host_below: int | None = None):
        if host_below is None:
            host_below = int(os.environ.get("BPPP_JAX_MIN_LANES", "0"))
        self.host_below = host_below
        self._host = HostEngine()

    # -- msm ---------------------------------------------------------------
    def msm(self, pairs):
        flt = [(int(s) % R, p) for s, p in pairs]
        flt = [(s, p) for s, p in flt if s != 0 and p is not None]
        if not flt:
            return None
        if 2 * len(flt) < self.host_below:
            return self._host.msm(flt)
        metrics.count("engine.msm.lanes", 2 * len(flt))
        absd, sgn, lanes_pts = _msm_lanes(flt)
        L = _bucket(absd.shape[1])
        pad = L - absd.shape[1]
        if pad:
            z = np.zeros((glv.ROWS, pad), np.uint32)
            absd = np.concatenate([absd, z], axis=1)  # digit 0 = identity
            sgn = np.concatenate([sgn, z], axis=1)
            lanes_pts = lanes_pts + [ec.G] * pad
        px, py, pz = curve.from_affine_host(lanes_pts)
        acc = msm.run_msm(px, py, pz, jnp.asarray(absd), jnp.asarray(sgn))
        return curve.to_affine_host(acc)[0]

    # -- per-round basis folding --------------------------------------------
    def fold_bases(self, b: int, a: int, g_even, g_odd):
        n = len(g_even)
        if n == 0:
            return []
        if n < self.host_below:
            return self._host.fold_bases(b, a, g_even, g_odd)
        return self._two_table_mul(int(b), int(a), list(g_even), list(g_odd))[:n]

    # -- shared scalar multiplication ----------------------------------------
    def shared_mul(self, k: int, pts):
        n = len(pts)
        if n == 0:
            return []
        if n < self.host_below:
            return self._host.shared_mul(k, pts)
        k1, k2 = glv.split(int(k) % R)
        return self._two_table_mul(k1, k2, list(pts), [_endo_host(p) for p in pts])[:n]

    # -- shared kernel -------------------------------------------------------
    def _two_table_mul(self, se: int, so: int, even_pts, odd_pts):
        """Per-lane se*E_i + so*O_i (shared scalars, per-lane bases)."""
        n = len(even_pts)
        L = _bucket(n)
        # None bases (odd-length pair padding in the argument layer,
        # reference: mapHalves default, src/Bulletproof.hs:63-75) become
        # identity lanes; pads use G (any valid point works)
        even_pts = even_pts + [ec.G] * (L - n)
        odd_pts = odd_pts + [ec.G] * (L - n)
        de, sge = glv.recode_signed(se)
        do, sgo = glv.recode_signed(so)
        pex, pey, pez = curve.from_affine_host(even_pts)
        pox, poy, poz = curve.from_affine_host(odd_pts)
        xn, yn, inf = msm.run_fold(
            pex, pey, pez, pox, poy, poz,
            jnp.asarray(de), jnp.asarray(sge), jnp.asarray(do), jnp.asarray(sgo),
        )
        return curve.affine_lanes_to_host(xn, yn, inf)


class ShardedJaxEngine(JaxEngine):
    """JaxEngine whose big MSMs run sharded over a device mesh
    (ops.sharded): lanes are data-parallel over the 'pts' axis and digit
    rows over the 'win' axis.  Small calls inherit the single-device path.

    This is the batch-verification engine: N merged proofs become one
    mesh-wide MSM (SURVEY §2 parallelism mapping).
    """

    def __init__(self, mesh=None, host_below: int | None = None, shard_above: int = 256):
        super().__init__(host_below=host_below)
        from . import sharded

        self.mesh = mesh if mesh is not None else sharded.make_mesh()
        self.shard_above = shard_above
        self._step = sharded.sharded_msm_jit(self.mesh)
        self._npts = self.mesh.shape["pts"]
        self._nwin = self.mesh.shape["win"]

    def msm(self, pairs):
        flt = [(int(s) % R, p) for s, p in pairs]
        flt = [(s, p) for s, p in flt if s != 0 and p is not None]
        if 2 * len(flt) < max(self.shard_above, self.host_below, 1):
            return super().msm(flt)
        from . import sharded

        absd, sgn, lanes_pts = _msm_lanes(flt)
        # lane count: multiple of npts with a power-of-two per-shard width
        # (npts is asserted to be a power of two in make_mesh usage)
        L = max(_bucket(absd.shape[1]), self._npts * 16)
        pad = L - absd.shape[1]
        if pad:
            z = np.zeros((glv.ROWS, pad), np.uint32)
            absd = np.concatenate([absd, z], axis=1)
            sgn = np.concatenate([sgn, z], axis=1)
            lanes_pts = lanes_pts + [ec.G] * pad
        absd, sgn = sharded.pad_rows(jnp.asarray(absd), jnp.asarray(sgn), self._nwin)
        px, py, pz = curve.from_affine_host(lanes_pts)
        acc = self._step(px, py, pz, absd, sgn)
        return curve.to_affine_host(acc)[0]
