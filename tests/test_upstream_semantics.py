"""Pins for every transcript-deciding upstream semantic (the assumption
registry in docs/UPSTREAM_SEMANTICS.md).  Each test re-derives the
expected bytes/values INDEPENDENTLY of the implementation under test,
directly from the quoted Haskell semantics.

A1/A2: reference src/Encoding.hs:74-86 (Binary (Prime p), toP reduce)
A3:    reference app/Main.hs:75-80 (shaOracle message layout)
A4:    reference src/ZKP.hs:73-101 (prepend ordering, 0-based PRG)
A5:    reference app/Main.hs:86-87,276-277 (1-based blind stream)
A6:    galois-field-1.0.1 derived Show of `newtype Prime p = P Natural`
A7:    elliptic-curve-0.3.0 pointX -> galois-field sr (Tonelli-Shanks)
"""

import hashlib
import random

from bulletproofspp_tpu.core import ec
from bulletproofspp_tpu.core.fields import Q, R
from bulletproofspp_tpu.core.transcript import (
    Transcript,
    decode_scalar,
    default_blinds,
    encode_scalar,
    sha_oracle,
)

# ---------------------------------------------------------------------------
# A1 — byte codec: (Word, Word, Word, Word) big-endian words, LOW word first
# ---------------------------------------------------------------------------


def test_binary_prime_decode_vectors():
    # get = a0 + a1<<64 + a2<<128 + a3<<192 where a_i are consecutive
    # 8-byte BIG-endian words of the input (Data.Binary Word codec)
    digest = bytes(range(32))
    a = [int.from_bytes(digest[8 * i : 8 * i + 8], "big") for i in range(4)]
    expect = (a[0] + (a[1] << 64) + (a[2] << 128) + (a[3] << 192)) % R
    assert decode_scalar(digest, R) == expect

    # word order is NOT the naive big-endian integer: byte 0..7 is the LOW word
    assert decode_scalar(b"\x00" * 24 + b"\x00" * 7 + b"\x01", R) == 1 << 192
    assert decode_scalar(b"\x00" * 7 + b"\x01" + b"\x00" * 24, R) == 1


def test_encode_low_word_first():
    # put: (q0,a0) = n divMod 2^64; ... put (a0,a1,a2,a3) each BE
    assert encode_scalar(1) == b"\x00" * 7 + b"\x01" + b"\x00" * 24
    assert encode_scalar(1 << 64) == b"\x00" * 8 + b"\x00" * 7 + b"\x01" + b"\x00" * 16
    v = random.Random(7).randrange(1 << 255)
    assert decode_scalar(encode_scalar(v), 1 << 256) == v


# ---------------------------------------------------------------------------
# A2 — toP silently reduces mod p on decode
# ---------------------------------------------------------------------------


def test_decode_reduces_mod_p():
    raw = b"\xff" * 32  # 2^256 - 1, far above both moduli
    full = sum(((1 << 64) - 1) << (64 * i) for i in range(4))
    assert decode_scalar(raw, Q) == full % Q
    assert decode_scalar(raw, R) == full % R
    # x-coordinates decoded from proof files use the same instance mod Q:
    # an out-of-range x is accepted reduced, not rejected
    from bulletproofspp_tpu.core.encoding import decode_commitments, encode_commitments

    pt = ec.point_x(2)
    assert pt is not None
    enc = bytearray(encode_commitments([pt]))
    x = int.from_bytes(b"".join(enc[1 + 8 * i : 9 + 8 * i] for i in range(4)), "big")
    # bump the stored x by Q (fits in 256 bits for secp256k1 x=2)
    bumped = encode_scalar(pt[0] + Q)
    enc[1:33] = bumped
    out = decode_commitments(1, bytes(enc))
    assert out is not None and out[0][0] == pt


# ---------------------------------------------------------------------------
# A3 — oracle message layout (show n <> show len <> coords), n from 1
# ---------------------------------------------------------------------------


def test_oracle_message_layout():
    pts = [ec.point_x(x) for x in (2, 3)]
    pts = [p for p in pts if p is not None]
    assert len(pts) == 2
    msg = b"1" + b"2" + b"".join(
        b"P " + str(x).encode() + b"P " + str(y).encode() for x, y in pts
    )
    expect = decode_scalar(hashlib.sha256(msg).digest(), R)
    assert sha_oracle(pts, 1) == expect
    # second scalar of the SAME transcript re-hashes with n=2
    msg2 = b"2" + msg[1:]
    assert sha_oracle(pts, 2) == decode_scalar(hashlib.sha256(msg2).digest(), R)


# ---------------------------------------------------------------------------
# A4 — prepend ordering; 0-based prover PRG counter
# ---------------------------------------------------------------------------


def test_prepend_ordering():
    p1, p2 = ec.point_x(2), ec.point_x(3)
    tr = Transcript(None)
    tr.oracle([p1], 1)
    got = tr.oracle([p2], 1)[0]
    # oracle xs = ... let cs' = xs ++ cs  => [p2, p1], length 2
    assert got == sha_oracle([p2, p1], 1)
    assert got != sha_oracle([p1, p2], 1)


def test_random_counter_zero_based():
    seed = b"seed"
    tr = Transcript(seed)
    # random = h n with state starting at ([], 0)
    assert tr.random() == decode_scalar(hashlib.sha256(seed + b"0").digest(), R)
    assert tr.random() == decode_scalar(hashlib.sha256(seed + b"1").digest(), R)


# ---------------------------------------------------------------------------
# A5 — default blinds: H("Blinding " <> seed <> show i), i from 1
# ---------------------------------------------------------------------------


def test_blind_stream_one_based():
    gen = default_blinds(b"rs")
    assert next(gen) == decode_scalar(hashlib.sha256(b"Blinding rs1").digest(), R)
    assert next(gen) == decode_scalar(hashlib.sha256(b"Blinding rs2").digest(), R)


# ---------------------------------------------------------------------------
# A6 — derived Show of `newtype Prime p = P Natural`
# ---------------------------------------------------------------------------


def _derived_shows_prec(d: int, con: str, n: int) -> str:
    """Transliteration of GHC's derived showsPrec for a unary constructor
    applied to a Natural (Haskell 2010 Report section 11.4): parenthesize
    iff d > 10; the argument shows at precedence 11 (Natural is
    non-negative, so never parenthesized itself)."""
    s = f"{con} {n}"
    return f"({s})" if d > 10 else s


def test_show_prime_format():
    from bulletproofspp_tpu.core.transcript import _show_field

    # shaOracle concatenates at top level: show x == showsPrec 0 x
    for v in (0, 1, 123, Q - 1):
        assert _show_field(v) == _derived_shows_prec(0, "P", v).encode()


# ---------------------------------------------------------------------------
# A7 — principal root; Tonelli-Shanks non-residue independence
# ---------------------------------------------------------------------------


def _tonelli_shanks(n: int, p: int, z: int) -> int | None:
    """Textbook Tonelli-Shanks parameterized by the non-residue z (any
    correct implementation, e.g. galois-field's `sr`, follows this shape)."""
    if n % p == 0:
        return 0
    if pow(n, (p - 1) // 2, p) != 1:
        return None
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    assert pow(z, (p - 1) // 2, p) == p - 1, "z must be a non-residue"
    m, c, t, r = s, pow(z, q, p), pow(n, q, p), pow(n, (q + 1) // 2, p)
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c, t, r = i, b * b % p, t * b * b % p, r * b % p
    return r


def test_sqrt_tonelli_shanks_nonresidue_independence():
    # p = 3 (mod 4): s = 1, so the adjustment loop never runs and EVERY
    # non-residue choice yields the principal power n^((p+1)/4)
    assert Q % 4 == 3
    rng = random.Random(42)
    nonresidues = [z for z in range(2, 50) if pow(z, (Q - 1) // 2, Q) == Q - 1][:4]
    assert len(nonresidues) >= 2
    for _ in range(5):
        n = pow(rng.randrange(2, Q), 2, Q)  # a guaranteed square
        principal = pow(n, (Q + 1) // 4, Q)
        for z in nonresidues:
            assert _tonelli_shanks(n, Q, z) == principal


def test_point_x_principal_root():
    # pointX x = A x <$> yX w x;  yX computes sr (x^3 + 7); for secp256k1
    # that is the principal power (see above + FastPrime.hs:213-218)
    for x in range(1, 40):
        pt = ec.point_x(x)
        v = (x * x * x + 7) % Q
        if pow(v, (Q - 1) // 2, Q) == 1 or v == 0:
            assert pt == (x, pow(v, (Q + 1) // 4, Q))
        else:
            assert pt is None


def test_point_x_rejects_nonresidue():
    # getPoints skips non-points via catMaybes while the counter advances
    from bulletproofspp_tpu.core.transcript import take_points

    pts = take_points(b"test points", 8)
    assert len(pts) == 8
    for x, y in pts:
        assert y * y % Q == (x * x * x + 7) % Q
        assert y == pow((x * x * x + 7) % Q, (Q + 1) // 4, Q)  # principal
