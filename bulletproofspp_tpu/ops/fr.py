"""Batched secp256k1 SCALAR-field (mod R) arithmetic on 16x16-bit limb planes.

The protocol layer's witness math is Fr arithmetic (reference:
src/Data/Field/Galois/FastPrime.hs instantiated at the group order;
host ground truth in core.fields.Fr).  ops.limb covers the coordinate
field Q = 2^256 - 2^32 - 977, whose sparse offset allows cheap lazy
folds; the group order R = 2^256 - C_R has a 129-bit offset
C_R = 0x14551231950b75fc4402da1732fc9bebf, so reduction here folds the
high limbs through a genuine multiprecision product hi * C_R instead of
limb.py's shift-and-add-977.  This module is the device ground layer for
the fused on-device prover (core.fused): every value is a (16, ...)
uint32 limb array, carried (< 2^16 per limb, total < 2^256 — values may
exceed R; ``normalize`` produces the canonical representative).

All ops are shape-polymorphic over trailing batch axes and safe under
``jax.jit`` / ``lax.scan`` / ``jax.vmap``.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core.fields import R
from .limb import NLIMB, LBITS, MASK, _carry, pack_int, pack_ints, unpack_int, unpack_ints, zeros, ones, select, _shift

U32 = jnp.uint32

# R = 2^256 - C_R; C_R has 129 bits = 9 limbs of 16
C_R = (1 << 256) - R
_CR_NLIMB = 9
assert C_R.bit_length() == 129
_CR = pack_int(C_R)[:_CR_NLIMB]  # numpy (9,) — lifted as a jit constant

# a - b computed as a + (0xffff-b) + K2 with K2 = 2R - 2^256 + 1 >= 0
_K2R = pack_int(2 * R - (1 << 256) + 1)


def _u(x):
    return jnp.asarray(x, U32)


def mul_wide(a, b):
    """Exact widening product of two carried limb arrays.

    a: (Ka, ...), b: (Kb, ...) with limbs < 2^16.  Returns CARRIED limbs
    (Ka+Kb, ...) holding the full product (< 2^(16*(Ka+Kb))).

    Same lo/hi-split schoolbook + shear-trick column sums as limb.mul
    (column sums have <= min(Ka, Kb) <= 16 terms < 2^16 each, so every
    intermediate fits uint32 exactly)."""
    Ka, Kb = a.shape[0], b.shape[0]
    assert min(Ka, Kb) <= NLIMB, "column sums must stay below 16 terms"
    batch = a.shape[1:]
    prods = a[:, None] * b[None, :]  # (Ka, Kb, ...) exact: < 2^32
    lo = prods & MASK
    hi = prods >> LBITS

    def shear(x):
        # (Ka, Kb, ...) -> column sums (Ka+Kb-1, ...), col k = sum_{i+j=k}
        xp = jnp.pad(x, [(0, 0), (0, Ka)] + [(0, 0)] * len(batch))
        flat = xp.reshape(Ka * (Kb + Ka), *batch)
        flat = flat[: Ka * (Kb + Ka - 1)]
        return flat.reshape(Ka, Kb + Ka - 1, *batch).sum(axis=0, dtype=U32)

    ncols = Ka + Kb
    cols = jnp.zeros((ncols, *batch), U32)
    cols = cols.at[: ncols - 1].add(shear(lo))
    cols = cols.at[1:ncols].add(shear(hi))
    # columns < 2 * 16 * 2^16 = 2^21: exact carry
    return _carry(cols)[:ncols]


def _add_carried(a, b):
    """Sum of two carried limb arrays (different lengths ok), carried
    output sized to hold the exact value."""
    Ka, Kb = a.shape[0], b.shape[0]
    K = max(Ka, Kb)
    batch = a.shape[1:]
    if Ka < K:
        a = jnp.concatenate([a, jnp.zeros((K - Ka, *batch), U32)], axis=0)
    if Kb < K:
        b = jnp.concatenate([b, jnp.zeros((K - Kb, *batch), U32)], axis=0)
    return _carry(a + b)  # (K+1, ...)


def _fold_r(x):
    """One reduction fold: value(x) = lo + 2^256 * hi ≡ lo + hi * C_R
    (mod R).  x: carried (K, ...) with K > 16.  Output carried, exact."""
    lo, hi = x[:NLIMB], x[NLIMB:]
    cr = jnp.asarray(_CR, U32).reshape(_CR_NLIMB, *([1] * (x.ndim - 1)))
    cr = jnp.broadcast_to(cr, (_CR_NLIMB, *x.shape[1:]))
    return _add_carried(lo, mul_wide(hi, cr))


def _reduce_full(x):
    """Carried (K, ...) of any K -> carried (16, ...) < 2^256, ≡ mod R.

    Folds until the static limb count stops shrinking (17 rows), then two
    tail folds: from ANY carried 17-row input (value < 2^272), fold 1
    leaves value < 2^256 + 2^146 (top in {0,1}); fold 2 leaves either the
    untouched < 2^256 value (top 0) or < 2^147 — top row provably zero."""
    while x.shape[0] > NLIMB + 1:
        x = _fold_r(x)
    if x.shape[0] == NLIMB:
        return x
    x = _fold_r(x)
    x = _fold_r(x)
    return x[:NLIMB]


@jax.jit
def add(a, b):
    """a + b mod R; carried in/out (< 2^256)."""
    return _reduce_full(_carry(a + b))


@jax.jit
def sub(a, b):
    """a - b mod R via the borrow-free complement: a + (0xffff - b) + K2R
    where K2R = 2R - 2^256 + 1 (value a - b + 2R < 2^258, then fold)."""
    k2 = jnp.asarray(_K2R, U32).reshape(NLIMB, *([1] * (a.ndim - 1)))
    w = _u(MASK) - b
    c = _carry(a + w + k2)  # value < 3 * 2^256: top limb <= 2
    # one extra fold beyond _reduce_full's two: top can be 2 here
    return _reduce_full(_fold_r(c))


def neg(a):
    return sub(zeros(a.shape[1:]), a)


@jax.jit
def mul(a, b):
    """a * b mod R: widening schoolbook then the C_R fold chain
    (32 -> 26 -> 20 -> 17 -> 2 tail folds)."""
    return _reduce_full(mul_wide(a, b))


def sqr(a):
    return mul(a, a)


@jax.jit
def normalize(a):
    """Canonical representative < R.  Inputs are < 2^256 < 2R, so one
    conditional subtract suffices."""
    r_limbs = jnp.asarray(pack_int(R), U32).reshape(NLIMB, *([1] * (a.ndim - 1)))

    def step(borrow, ab):
        av, pv = ab
        t = av - pv - borrow
        return t >> 31, t & MASK

    borrow, outs = lax.scan(
        step, jnp.zeros_like(a[0]), (a, jnp.broadcast_to(r_limbs, a.shape))
    )
    return jnp.where(borrow[None] == 0, outs, a)


@jax.jit
def is_zero(a):
    n = normalize(a)
    return jnp.all(n == 0, axis=0)


@jax.jit
def eq(a, b):
    return is_zero(sub(a, b))


_INV_EXP_BITS = np.array([(R - 2) >> i & 1 for i in range(255, -1, -1)], dtype=np.uint32)


@jax.jit
def inv(a):
    """Fermat inverse a^(R-2); 0 -> 0 (matching core.fields semantics is
    the caller's concern — the protocol never inverts zero)."""
    bits = jnp.asarray(_INV_EXP_BITS)

    def step(r, bit):
        r2 = mul(r, r)
        rm = mul(r2, a)
        return jnp.where(bit > 0, rm, r2), None

    r, _ = lax.scan(step, ones(a.shape[1:]), bits)
    return r


@partial(jax.jit, static_argnums=1)
def batch_inv(a, axis=1):
    """Montgomery batch inversion along a batch axis (one Fermat chain);
    zeros map to zero (reference: src/Data/Field/BatchInverse.hs:14-24)."""
    zmask = is_zero(a)
    ax = select(zmask, ones(a.shape[1:]), a)
    prefix = lax.associative_scan(mul, ax, axis=axis)
    suffix = lax.associative_scan(mul, ax, axis=axis, reverse=True)
    total = jnp.take(prefix, a.shape[axis] - 1, axis=axis)
    t = jnp.expand_dims(inv(total), axis)
    exc_pre = _shift(prefix, axis, 1, fill_one=True)
    exc_suf = _shift(suffix, axis, -1, fill_one=True)
    out = mul(mul(exc_pre, t), exc_suf)
    return select(zmask, zeros(a.shape[1:]), out)


# re-exported host<->limb conversions (same 16x16 format as ops.limb)
__all__ = [
    "add", "sub", "neg", "mul", "sqr", "inv", "batch_inv", "normalize",
    "is_zero", "eq", "mul_wide", "pack_int", "pack_ints", "unpack_int",
    "unpack_ints", "zeros", "ones", "select",
]
