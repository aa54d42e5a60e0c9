"""Eisenstein integers and GLV decomposition via the Eisenstein lattice.

(reference: src/Data/Field/Eis.hs; src/Data/Field/Galois/FastPrime.hs:186-205
``decomposeFastPrimeEis``; src/Data/Curve/Weierstrass/FastSECP256K1.hs:37-60
hard-codes the cube roots of unity and the factorization of the
characteristic — here both are DERIVED.)

Z[ω] with ω² + ω + 1 = 0 (ω³ = 1).  Both secp256k1 primes are ≡ 1 mod 3,
so they split as p = π·π̄ in Z[ω]; scalars decompose as k ≡ a + b·λ
(mod n) with |a|, |b| ≈ √n, where λ is the image of ω — the GLV split the
MSM engine uses (ops.glv implements the production integer-lattice variant;
this module is the reference-parity Eisenstein toolkit and an independent
cross-check).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Eis:
    """a + b·ω (reference: Eis.hs:17-41)."""

    a: int
    b: int

    def __add__(self, o: "Eis") -> "Eis":
        return Eis(self.a + o.a, self.b + o.b)

    def __sub__(self, o: "Eis") -> "Eis":
        return Eis(self.a - o.a, self.b - o.b)

    def __neg__(self) -> "Eis":
        return Eis(-self.a, -self.b)

    def __mul__(self, o: "Eis") -> "Eis":
        # (a+bω)(c+dω) = ac + (ad+bc)ω + bdω²; ω² = -1-ω
        a, b, c, d = self.a, self.b, o.a, o.b
        return Eis(a * c - b * d, a * d + b * c - b * d)

    def conj(self) -> "Eis":
        """Complex conjugate: ω̄ = ω² = -1-ω (reference: Eis.hs conjEis)."""
        return Eis(self.a - self.b, -self.b)

    def norm(self) -> int:
        """N(a+bω) = a² - ab + b² (multiplicative, ≥ 0)."""
        return self.a * self.a - self.a * self.b + self.b * self.b

    def is_zero(self) -> bool:
        return self.a == 0 and self.b == 0


def _round_div(n: int, d: int) -> int:
    """Round-to-nearest integer division (d > 0)."""
    return (2 * n + d) // (2 * d)


def quot_rem(n: Eis, d: Eis):
    """Rounded Euclidean division: n = q*d + r with N(r) <= (3/4)N(d)
    (reference: Eis.hs:72-83 rounded quotRem)."""
    nd = d.norm()
    assert nd > 0
    t = n * d.conj()  # n/d = t / N(d)
    q = Eis(_round_div(t.a, nd), _round_div(t.b, nd))
    r = n - q * d
    return q, r


def eis_gcd(x: Eis, y: Eis) -> Eis:
    """Euclidean gcd in Z[ω] (norm strictly decreases under quot_rem)."""
    while not y.is_zero():
        _, r = quot_rem(x, y)
        x, y = y, r
    return x


def char_eis(p: int, omega: int) -> Eis:
    """The Eisenstein prime π with N(π) = p, for p ≡ 1 mod 3 and omega a
    primitive cube root of unity mod p: π = gcd(p, omega - ω).

    (the reference hard-codes these for both secp256k1 primes,
    reference: FastSECP256K1.hs:37-60; deriving them checks the values)"""
    assert p % 3 == 1
    assert pow(omega, 3, p) == 1 and omega % p != 1
    pi = eis_gcd(Eis(p, 0), Eis(omega, -1))
    assert pi.norm() == p
    return pi


def decompose_eis(k: int, p: int, pi: Eis) -> tuple[int, int]:
    """k (mod p) -> (a, b) with a + b*omega ≡ k (mod p) and |a|, |b| ≈ √p:
    reduce k modulo π in Z[ω] (reference: decomposeFastPrimeEis,
    FastPrime.hs:186-205 — the same lattice reduction via shift-rounding)."""
    _, r = quot_rem(Eis(k % p, 0), pi)
    return r.a, r.b


def reconstruct_eis_ratio(x: int, p: int, pi: Eis):
    """Small numerator/denominator pair (n, d) in Z[ω] with n ≡ x·d
    (mod π) and coordinate sizes ≈ p^(1/4) (reference: Eis.hs:87-103
    ``reconstructEisRatio`` via egcd lattice reduction)."""
    r0, s0 = pi, Eis(0, 0)
    r1, s1 = quot_rem(Eis(x % p, 0), pi)[1], Eis(1, 0)
    if r1.is_zero():
        return Eis(0, 0), Eis(1, 0)
    bound = int(p**0.5) + 1
    while r1.norm() > bound:
        q, r = quot_rem(r0, r1)
        r0, r1 = r1, r
        s0, s1 = s1, s0 - q * s1
    return r1, s1
