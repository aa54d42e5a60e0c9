import random

import pytest

from bulletproofspp_tpu.core.fields import Fq, Fr, Q, R, batch_inverse
from bulletproofspp_tpu.core import ec
from bulletproofspp_tpu.core.rational import rational_reduce, signed_lift

random.seed(42)


def test_field_ops():
    for cls in (Fq, Fr):
        for _ in range(50):
            a = cls(random.randrange(cls.P))
            b = cls(random.randrange(1, cls.P))
            assert int(a + b) == (int(a) + int(b)) % cls.P
            assert int(a - b) == (int(a) - int(b)) % cls.P
            assert int(a * b) == (int(a) * int(b)) % cls.P
            assert int(b * b.inv()) == 1
            assert int((a / b) * b) == int(a)


def test_sqrt_principal():
    for _ in range(20):
        a = Fq(random.randrange(Q))
        s = (a * a).sqrt()
        assert s is not None and int(s * s) == int(a * a)
        # principal root is the power (p+1)/4
        assert int(s) == pow(int(a * a), (Q + 1) // 4, Q)


def test_batch_inverse():
    xs = [Fr(random.randrange(R)) for _ in range(17)]
    xs[3] = Fr(0)
    xs[11] = Fr(0)
    out = batch_inverse(xs)
    for x, y in zip(xs, out):
        if int(x) == 0:
            assert int(y) == 0
        else:
            assert int(x * y) == 1


def test_group_law():
    g = ec.G
    assert ec.is_on_curve(g)
    g2 = ec.add(g, g)
    assert ec.is_on_curve(g2)
    assert ec.add(g, None) == g
    assert ec.add(g, ec.neg(g)) is None
    # scalar mul consistency
    g5 = ec.scalar_mul(5, g)
    assert g5 == ec.add(g2, ec.add(g2, g))
    # order
    assert ec.scalar_mul(R, g) is None
    # jacobian mixed add agrees
    j = ec.jac_add_affine(ec.to_jac(g2), g)
    assert ec.from_jac(j) == ec.add(g2, g)
    # doubling edge in mixed add
    j = ec.jac_add_affine(ec.to_jac(g), g)
    assert ec.from_jac(j) == g2


def test_endomorphism():
    g = ec.G
    assert ec.endo(g) == ec.scalar_mul(ec.LAMBDA, g)


def test_msm_host():
    pts = [ec.scalar_mul(random.randrange(1, R), ec.G) for _ in range(9)]
    ss = [random.randrange(R) for _ in range(9)]
    want = None
    for s, p in zip(ss, pts):
        want = ec.add(want, ec.scalar_mul(s, p))
    assert ec.msm_host(ss, pts) == want


def test_double_base_mul():
    p1 = ec.scalar_mul(1234567, ec.G)
    p2 = ec.scalar_mul(7654321, ec.G)
    for a, b in [(5, 7), (-5, 7), (5, -7), (-123456789, 987654321)]:
        want = ec.add(ec.scalar_mul(a % R, p1), ec.scalar_mul(b % R, p2))
        assert ec.double_base_mul(a, p1, b, p2) == want


def test_rational_reduce():
    for _ in range(30):
        x = random.randrange(1, R)
        a, b = rational_reduce(x, R)
        assert a * a <= 2 * R
        assert (a - b * x) % R == 0
    assert signed_lift(R - 1, R) == -1
    assert signed_lift(1, R) == 1
