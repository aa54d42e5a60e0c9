"""Offline (no chip) evaluation of _mul_lazy merge-tree variants by
tile-accounted issue counts (opcount).  The current pairwise-adjacent
merge tree creates 17..24-row intermediates whose ops pad to 24/32
sublanes; stride-8 pairing overlaps only 8 rows per level-1 merge and
keeps early planes at exactly 24 rows (3 tiles).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from bulletproofspp_tpu.ops import pallas_field as pf
from bulletproofspp_tpu import opcount

NLIMB = pf.NLIMB
MASK = pf.MASK


def _mul_lazy_stride(a, b):
    """Stride-8 merge order: pair planes at offset distance 8 first
    (8-row overlaps, 24-row tile-exact outputs), then 4, 2, 1, then fold
    in the top plane."""
    parts = []
    hi_prev = None
    for i in range(NLIMB):
        prod = a[i : i + 1, :] * b
        lo = prod & MASK
        hi = prod >> 16
        parts.append((lo if hi_prev is None else lo + hi_prev, i))
        hi_prev = hi
    top = (hi_prev, NLIMB)
    # parts: 16 planes at offsets 0..15; merge strides 8, 4, 2, 1
    for stride in (8, 4, 2, 1):
        nxt = []
        for i in range(stride):
            if i + stride < len(parts):
                nxt.append((pf._merge_off(*parts[i], *parts[i + stride]), parts[i][1]))
            else:
                nxt.append(parts[i])
        parts = nxt
    acc = pf._merge_off(*parts[0], *top)
    return pf._lazy_fold(pf._lazy_fold(acc))


def report(label, mul_lazy):
    orig = pf._mul_lazy
    pf._mul_lazy = mul_lazy
    try:
        c = opcount.padd_op_counts()
    finally:
        pf._mul_lazy = orig
    charged = c.get("mul", 0) + c.get("elem", 0) + c.get("copy", 0)
    tiled = c.get("mul_tiled", 0) + c.get("elem_tiled", 0) + c.get("copy_tiled", 0)
    print(
        f"{label:28s} charged={charged:8.0f}  tiled={tiled:8.0f}  "
        f"mul={c.get('mul', 0):6.0f} elem={c.get('elem', 0):7.0f} copy={c.get('copy', 0):7.0f} "
        f"(tiled: {c.get('mul_tiled', 0):6.0f}/{c.get('elem_tiled', 0):7.0f}/{c.get('copy_tiled', 0):7.0f})"
    )
    return charged, tiled


def check_exact(mul_lazy):
    """Bit-exactness of the padd body vs the production one (interpret)."""
    import numpy as np
    import random

    from bulletproofspp_tpu.ops import limb
    from bulletproofspp_tpu.core.fields import Q

    rng = random.Random(5)
    vals = [rng.randrange(Q) for _ in range(12)] + [Q - 1, (1 << 256) % Q % Q]
    W = 128
    cols = [vals[i % len(vals)] for i in range(W)]
    a = jnp.asarray(np.stack([limb.pack_int(v) for v in cols], axis=1).astype(np.uint32))
    b = jnp.asarray(np.stack([limb.pack_int((v * 3 + 1) % Q) for v in cols], axis=1).astype(np.uint32))
    k2 = jnp.asarray(pf._kc())
    ref = pf._mul_f16(a, b)
    orig = pf._mul_lazy
    pf._mul_lazy = mul_lazy
    try:
        got = pf._tighten(mul_lazy(a, b))
    finally:
        pf._mul_lazy = orig
    ok = bool((np.asarray(ref) == np.asarray(got)).all())
    print(f"  exactness vs production mul: {'OK' if ok else 'MISMATCH'}")
    return ok


if __name__ == "__main__":
    report("current (adjacent pairs)", pf._mul_lazy)
    report("stride-8 pairing", _mul_lazy_stride)
    check_exact(_mul_lazy_stride)


def _mul_lazy_split8(a, b):
    """Tile-aligned product formation: split b into 8-limb halves so every
    partial-product plane is 8 rows (one (8,128) vector-register tile).
    Planes: lo/hi of a_i * b_half land at offsets i+8*half (+1 for hi);
    same-offset planes add ALIGNED (8-row ops), the 25 distinct-offset
    planes then concat into 24-row staircase planes at offsets 0..7
    (pure copies, no ragged adds) and merge by halving with overlaps only
    in the last three levels."""
    b0, b1 = b[:8], b[8:16]
    # per-offset 8-row accumulation planes, offsets 0..24
    offs = {}

    def acc(o, p):
        offs[o] = offs[o] + p if o in offs else p

    for i in range(NLIMB):
        for half, bh in ((0, b0), (1, b1)):
            prod = a[i : i + 1, :] * bh  # (8, BL) exact in uint32
            o = i + 8 * half
            acc(o, prod & MASK)
            acc(o + 1, prod >> 16)
    # concat staircases: (o, o+8), then (o, o+16) -> 24-row planes @0..7,
    # plus the lone 8-row plane @24
    p16 = {o: jnp.concatenate([offs[o], offs[o + 8]], axis=0) for o in range(8)}
    p24 = {o: jnp.concatenate([p16[o], offs[o + 16]], axis=0) for o in range(8)}
    parts = [(p24[o], o) for o in range(8)] + [(offs[24], 24)]
    while len(parts) > 1:
        nxt = [
            (pf._merge_off(*parts[j], *parts[j + 1]), parts[j][1])
            for j in range(0, len(parts) - 1, 2)
        ]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return pf._lazy_fold(pf._lazy_fold(parts[0][0]))
