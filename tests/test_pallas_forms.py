"""Wrapped-form (w16) parity for the Pallas field bodies.

The round-4 kernel bodies keep every value in exactly 16 rows (2 VPU
sublane tiles): products whose consumers are additive finish with ONE
wrapped carry (`_carry_wrap`, the 2^256 overflow folded back through
2^256 = 2^32 + 977 mod p into rows 0/2) and only mul inputs / kernel
outputs pay the strict two-resolve `_tighten`.  These tests pin every
mixed-form path against exact host bignum evaluation of the same RCB
algebra, on RANDOM and on ADVERSARIAL saturated-limb operands (long
0xFFFF runs — the operand class that exposed the round-2 dropped-carry
bug, see test_ops_limb.test_mul_dropped_carry_regression).

Runs the plain jnp bodies on CPU (no pallas_call): the arithmetic is
identical to what Mosaic compiles; the kernel-launch plumbing has its
own interpret-mode tests in test_pallas.py.

Reference algebra: Renes–Costello–Batina complete formulas as used by
/root/reference's group law (reference src/Utils.hs point ops); b3 = 21.
"""

import random

import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
import numpy as np

from bulletproofspp_tpu.core.fields import Q
from bulletproofspp_tpu.ops import limb
from bulletproofspp_tpu.ops import pallas_field as pf

rng = random.Random(31)

# adversarial operands: saturated 0xFFFF runs, boundary values, the
# round-2 regression operand, plus randoms
SAT = [
    Q - 1,
    Q - 2,
    (1 << 256) % Q,
    ((1 << 256) - 1) % Q,
    0xFFFF_FFFF_FFFF_FFFF_FFFF_FFFF_FFFF_FFFF,
    int("FFFF" * 8 + "0000" * 8, 16) % Q,
    int(("FFFF0000" * 8), 16) % Q,
    94329926858193610711403129864407773699609837703255222953893265490612872160623,
    pow(2**200 + 7, 2, Q),
    0,
    1,
    2,
]
VALS = SAT + [rng.randrange(Q) for _ in range(20)]


def _vals_of(arr):
    """(R, n) limb array -> exact values (R may exceed 16)."""
    a = np.asarray(arr, np.uint64)
    return [
        int(sum(int(a[i, j]) << (16 * i) for i in range(a.shape[0])))
        for j in range(a.shape[1])
    ]


def _check_w16(arr, name="", row_bound=1 << 21):
    """The w16 contract: 16 rows; rows other than 0/2 strict (< 2^16);
    rows 0/2 lazily elevated but < row_bound (2^21 at every in-kernel
    call site where the wrap excess w <= 2^11; < 2^26 in full
    generality, w <= 2^16); value < 2^256 + 2^49."""
    a = np.asarray(arr)
    assert a.shape[0] == pf.NLIMB, name
    strict_rows = [1] + list(range(3, pf.NLIMB))
    assert a[strict_rows].max() <= 0xFFFF, name
    assert a[0].max() < row_bound and a[2].max() < row_bound, name
    for v in _vals_of(a):
        assert v < (1 << 256) + (1 << 49), name
    return a


def _check_f16(arr, name=""):
    a = np.asarray(arr)
    assert a.shape[0] == pf.NLIMB, name
    assert a.max() <= 0xFFFF, name
    for v in _vals_of(a):
        assert v < 1 << 256, name  # strict limbs (not nec. canonical)
    return a


def test_mul_w16_form_and_value():
    a_int = VALS
    b_int = VALS[::-1]
    a = jnp.asarray(limb.pack_ints(a_int))
    b = jnp.asarray(limb.pack_ints(b_int))
    c = _check_w16(jax.jit(pf._mul_w16)(a, b), "mul_w16")
    for v, x, y in zip(_vals_of(c), a_int, b_int):
        assert v % Q == x * y % Q


def test_mul_f16_strict():
    a = jnp.asarray(limb.pack_ints(VALS))
    b = jnp.asarray(limb.pack_ints(VALS[::-1]))
    c = _check_f16(jax.jit(pf._mul_f16)(a, b), "mul_f16")
    for v, x, y in zip(_vals_of(c), VALS, VALS[::-1]):
        assert v % Q == x * y % Q


def test_mul_small_forms():
    a = jnp.asarray(limb.pack_ints(VALS))
    w = _check_w16(jax.jit(lambda x: pf._mul_small_w16(x, 21))(a), "muls_w16")
    for v, x in zip(_vals_of(w), VALS):
        assert v % Q == 21 * x % Q
    # w16 input (a mul product) -> both output forms
    m = jax.jit(pf._mul_w16)(a, a)
    f = _check_f16(jax.jit(lambda x: pf._mul_small_f16(x, 8))(m), "muls_f16")
    for v, x in zip(_vals_of(f), VALS):
        assert v % Q == 8 * x * x % Q
    w2 = _check_w16(jax.jit(lambda x: pf._mul_small_w16(x, 32))(m), "muls_w16_w")
    for v, x in zip(_vals_of(w2), VALS):
        assert v % Q == 32 * x * x % Q


def test_add_sub_mixed_forms():
    """Every add/sub operand-form combination the kernel bodies use,
    against bignum.  All outputs must satisfy the strict f16 contract."""
    kc = jnp.asarray(pf._kc())
    a = jnp.asarray(limb.pack_ints(VALS))
    b = jnp.asarray(limb.pack_ints(VALS[::-1]))
    zero = jnp.zeros_like(a)
    ma = jax.jit(pf._mul_w16)(a, a)  # w16, x^2
    mb = jax.jit(pf._mul_w16)(b, b)  # w16, y^2
    cases = {
        # _add_f16 / _tighten add paths
        "add_w16_w16": (jax.jit(pf._add_f16)(ma, mb), lambda x, y: x * x + y * y),
        "add_w16_f16": (jax.jit(pf._add_f16)(ma, b), lambda x, y: x * x + y),
        "tighten_w16_sum": (
            jax.jit(lambda p, q: pf._tighten(p + q))(ma, mb),
            lambda x, y: x * x + y * y,
        ),
        "tighten_s17": (
            jax.jit(lambda p, q: pf._tighten_s17(p + q))(a, b),
            lambda x, y: x + y,
        ),
        # _sub_f16 subtrahend classes (docstring bounds)
        "sub_w16_w16": (
            jax.jit(lambda p, q: pf._sub_f16(kc, p, q))(ma, mb),
            lambda x, y: x * x - y * y,
        ),
        "sub_w16_raw2": (  # raw sum of two w16 as subtrahend
            jax.jit(lambda p, q: pf._sub_f16(kc, p, p + q))(ma, mb),
            lambda x, y: -(y * y),
        ),
        "sub_f16_w16": (
            jax.jit(lambda p, q: pf._sub_f16(kc, p, q))(a, mb),
            lambda x, y: x - y * y,
        ),
        "sub_small_multiple": (  # strict * 3 raw subtrahend (pdbl t0s)
            jax.jit(lambda p, q: pf._sub_f16(kc, p, q * jnp.uint32(3)))(ma, b),
            lambda x, y: x * x - 3 * y,
        ),
        "neg": (  # table negation: zero minuend
            jax.jit(lambda p, q: pf._sub_f16(kc, p, q))(zero, b),
            lambda x, y: -y,
        ),
    }
    for name, (got, want_fn) in cases.items():
        got_arr = _check_f16(got, name)
        for v, x, y in zip(_vals_of(got_arr), VALS, VALS[::-1]):
            assert v % Q == want_fn(x, y) % Q, name


def test_tighten_arbitrary_saturated():
    """_tighten / _carry_wrap on fully saturated arbitrary-limb input
    (every limb 2^32 - 1, value (2^16+1)(2^256-1) — above 2^256 by 2^16x,
    the worst case any kernel sum can approach)."""
    x = jnp.full((pf.NLIMB, 4), np.uint32(0xFFFFFFFF), jnp.uint32)
    want = ((2**32 - 1) * sum(1 << (16 * i) for i in range(16))) % Q
    f = _check_f16(jax.jit(pf._tighten)(x), "tighten_sat")
    for v in _vals_of(f):
        assert v % Q == want
    w = _check_w16(jax.jit(pf._carry_wrap)(x), "wrap_sat", row_bound=1 << 26)
    for v in _vals_of(w):
        assert v % Q == want


def _padd_ref(p1, p2):
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    t0, t1, t2 = x1 * x2, y1 * y2, z1 * z2
    t3 = (x1 + y1) * (x2 + y2) - t0 - t1
    t4 = (y1 + z1) * (y2 + z2) - t1 - t2
    t5 = (x1 + z1) * (x2 + z2) - t0 - t2
    t0_3, t2b = 3 * t0, 21 * t2
    z3t, t1m, y3b = t1 + t2b, t1 - t2b, 21 * t5
    return (
        (t3 * t1m - t4 * y3b) % Q,
        (y3b * t0_3 + t1m * z3t) % Q,
        (z3t * t4 + t0_3 * t3) % Q,
    )


def _pdbl_ref(p):
    x, y, z = p
    t0 = y * y
    z3 = 8 * t0
    t1 = y * z
    t2 = 21 * z * z
    x3 = t2 * z3
    y3 = t0 + t2
    z3o = t1 * z3
    t0s = t0 - 3 * t2
    y3 = x3 + t0s * y3
    x3 = 2 * (t0s * (x * y))
    return x3 % Q, y3 % Q, z3o % Q


def test_padd_pdbl_bodies_vs_bignum():
    """The full bodies on arbitrary (not necessarily on-curve) triples:
    the RCB formulas are polynomial identities, so parity on arbitrary
    field elements is strictly stronger than on curve points."""
    kc = jnp.asarray(pf._kc())
    n = len(VALS)
    tri = [VALS, VALS[::-1], [pow(v, 3, Q) for v in VALS]]
    sat_cycled = [SAT[j % len(SAT)] for j in range(n)]
    tri2 = [[pow(v, 5, Q) for v in VALS], sat_cycled, VALS]
    arrs1 = [jnp.asarray(limb.pack_ints(t)) for t in tri]
    arrs2 = [jnp.asarray(limb.pack_ints(t)) for t in tri2]

    got = jax.jit(pf._padd_body)(kc, *arrs1, *arrs2)
    for gi, g in enumerate(got):
        _check_f16(g, f"padd coord {gi}")
        gv = [v % Q for v in _vals_of(np.asarray(g))]
        want = [
            _padd_ref(
                (tri[0][j], tri[1][j], tri[2][j]),
                (tri2[0][j], tri2[1][j], tri2[2][j]),
            )[gi]
            for j in range(n)
        ]
        assert gv == want, f"padd coord {gi}"

    got = jax.jit(pf._pdbl_body)(kc, *arrs1)
    for gi, g in enumerate(got):
        _check_f16(g, f"pdbl coord {gi}")
        gv = [v % Q for v in _vals_of(np.asarray(g))]
        want = [_pdbl_ref((tri[0][j], tri[1][j], tri[2][j]))[gi] for j in range(n)]
        assert gv == want, f"pdbl coord {gi}"
