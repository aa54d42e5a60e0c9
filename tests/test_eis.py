"""Eisenstein integer toolkit (reference: src/Data/Field/Eis.hs) —
algebraic laws, derived characteristic factorizations for both secp256k1
primes, and the Eisenstein GLV decomposition as a cross-check of the
production integer-lattice split (ops.glv)."""

import random

from bulletproofspp_tpu.core.ec import BETA, LAMBDA
from bulletproofspp_tpu.core.eis import (
    Eis,
    char_eis,
    decompose_eis,
    eis_gcd,
    quot_rem,
    reconstruct_eis_ratio,
)
from bulletproofspp_tpu.core.fields import Q, R

rng = random.Random(31)


def _rand_eis(bound=1 << 64):
    return Eis(rng.randrange(-bound, bound), rng.randrange(-bound, bound))


def test_ring_laws_and_norm():
    for _ in range(30):
        x, y, z = _rand_eis(), _rand_eis(), _rand_eis()
        assert (x + y) * z == x * z + y * z
        assert x * y == y * x
        assert (x * y) * z == x * (y * z)
        assert (x * y).norm() == x.norm() * y.norm()
        assert (x * x.conj()) == Eis(x.norm(), 0)


def test_quot_rem():
    for _ in range(30):
        n, d = _rand_eis(), _rand_eis(1 << 32)
        if d.is_zero():
            continue
        q, r = quot_rem(n, d)
        assert q * d + r == n
        assert 4 * r.norm() <= 3 * d.norm()


def test_char_eis_both_primes():
    # scalar field: lambda is the cube root of unity acting on scalars
    pi_r = char_eis(R, LAMBDA)
    assert pi_r.norm() == R
    # coordinate field: beta is the cube root of unity on x-coordinates
    pi_q = char_eis(Q, BETA)
    assert pi_q.norm() == Q


def test_decompose_eis_matches_glv_contract():
    pi = char_eis(R, LAMBDA)
    for _ in range(20):
        k = rng.randrange(R)
        a, b = decompose_eis(k, R, pi)
        assert (a + b * LAMBDA - k) % R == 0
        assert abs(a) < 1 << 129 and abs(b) < 1 << 129


def test_reconstruct_eis_ratio():
    pi = char_eis(R, LAMBDA)
    for _ in range(10):
        x = rng.randrange(1, R)
        n, d = reconstruct_eis_ratio(x, R, pi)
        assert not d.is_zero()
        # n ≡ x*d (mod pi): (n - x*d) divisible by pi in Z[omega]
        diff = n - Eis(x, 0) * d
        _, r = quot_rem(diff, pi)
        assert r.is_zero()
        # quarter-size coordinates
        assert n.norm() < R * 4 and d.norm() < R * 4
