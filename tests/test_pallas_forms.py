"""Deferred-reduction (c17) form parity for the Pallas field bodies.

The kernel bodies keep products in a 17-row carried form and let the
additive consumers absorb the top row (pallas_field._padd_body
docstring).  These tests pin every mixed-form path against exact host
bignum evaluation of the same RCB algebra, on RANDOM and on
ADVERSARIAL saturated-limb operands (long 0xFFFF runs — the operand
class that exposed the round-2 dropped-carry bug, see
test_ops_limb.test_mul_dropped_carry_regression).

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


def test_mul_c17_form_and_value():
    a_int = VALS
    b_int = VALS[::-1]
    a = jnp.asarray(limb.pack_ints(a_int))
    b = jnp.asarray(limb.pack_ints(b_int))
    c = jax.jit(pf._mul_c17)(a, b)
    assert c.shape[0] == pf.NLIMB + 1
    cn = np.asarray(c)
    assert cn.max() <= 0xFFFF, "c17 rows must be carried (< 2^16)"
    for v, x, y in zip(_vals_of(cn), a_int, b_int):
        assert v < 1 << 266, "c17 value bound"
        assert v % Q == x * y % Q


def test_mul_small_forms():
    a = jnp.asarray(limb.pack_ints(VALS))
    c17 = jax.jit(lambda x: pf._mul_small(x, 21, c17=True))(a)
    assert c17.shape[0] == pf.NLIMB + 1 and np.asarray(c17).max() <= 0xFFFF
    for v, x in zip(_vals_of(c17), VALS):
        assert v % Q == 21 * x % Q
    # 17-row input -> f16 output
    m = jax.jit(pf._mul_c17)(a, a)
    f = jax.jit(lambda x: pf._mul_small(x, 21))(m)
    assert f.shape[0] == pf.NLIMB
    for v, x in zip(_vals_of(np.asarray(f)), VALS):
        assert v < 1 << 256 and v % Q == 21 * x * x % Q


def test_add_sub_mixed_rows():
    kc = jnp.asarray(pf._kc())
    a = jnp.asarray(limb.pack_ints(VALS))
    b = jnp.asarray(limb.pack_ints(VALS[::-1]))
    ma = jax.jit(pf._mul_c17)(a, a)  # c17, value < 2^266
    mb = jax.jit(pf._mul_c17)(b, b)
    sub, sub_lazy = pf._subs(kc)
    cases = {
        "add_17_17": (jax.jit(pf._add)(ma, mb), lambda x, y: x * x + y * y),
        "add_17_16": (jax.jit(pf._add)(ma, b), lambda x, y: x * x + y),
        "add_16_17": (jax.jit(pf._add)(b, ma), lambda x, y: x * x + y),
        "sub_17_17": (jax.jit(sub)(ma, mb), lambda x, y: x * x - y * y),
        "sub_17_16": (jax.jit(sub)(ma, b), lambda x, y: x * x - y),
        "sub_16_17": (jax.jit(sub)(a, mb), lambda x, y: x - y * y),
        "sublazy_17x2": (
            jax.jit(sub_lazy)(ma, ma + mb),
            lambda x, y: x * x - (x * x + y * y),
        ),
        "sublazy_16_17": (
            jax.jit(sub_lazy)(a, ma + mb),
            lambda x, y: x - (x * x + y * y),
        ),
    }
    for name, (got, want_fn) in cases.items():
        got_arr = np.asarray(got)
        assert got_arr.shape[0] == pf.NLIMB, name
        for v, x, y in zip(_vals_of(got_arr), VALS, VALS[::-1]):
            assert v < 1 << 256, name  # f16 contract (not nec. canonical)
            assert v % Q == want_fn(x, y) % Q, name


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
        gv = [v % Q for v in _vals_of(np.asarray(g))]
        want = [_pdbl_ref((tri[0][j], tri[1][j], tri[2][j]))[gi] for j in range(n)]
        assert gv == want, f"pdbl coord {gi}"
