import hashlib

from bulletproofspp_tpu.core.fields import Q, R
from bulletproofspp_tpu.core import ec
from bulletproofspp_tpu.core.transcript import (
    Transcript,
    decode_scalar,
    encode_scalar,
    get_points,
    hash_to_scalar,
    sha_oracle,
    take_points,
)
from bulletproofspp_tpu.core.encoding import (
    bit_pack,
    bit_unpack,
    decode_commitments,
    encode_commitments,
    decode_scalars_points,
    encode_scalars_points,
)


def test_decode_scalar_word_order():
    # Binary (Prime p): 4 big-endian Word64s in little-endian word order
    digest = bytes(range(32))
    a0 = int.from_bytes(digest[0:8], "big")
    a3 = int.from_bytes(digest[24:32], "big")
    v = decode_scalar(digest, 1 << 256)
    assert v & ((1 << 64) - 1) == a0 % (1 << 64)
    assert (v >> 192) == a3
    assert decode_scalar(encode_scalar(v), 1 << 256) == v


def test_oracle_string_format():
    # hash (show n <> show (length ps) <> "P x" <> "P y" ...)
    pt = ec.G
    msg = b"1" + b"1" + b"P " + str(pt[0]).encode() + b"P " + str(pt[1]).encode()
    want = decode_scalar(hashlib.sha256(msg).digest(), R)
    assert sha_oracle([pt], 1) == want


def test_transcript_prepend_order():
    g2 = ec.add(ec.G, ec.G)
    tr = Transcript(b"seed")
    tr.oracle([ec.G], 1)
    v = tr.oracle([g2], 1)[0]
    # transcript list is [g2, G] (prepended)
    assert v == sha_oracle([g2, ec.G], 1)


def test_prover_randomness_counter():
    tr = Transcript(b"rs")
    assert tr.random() == hash_to_scalar(b"rs", b"0")
    assert tr.random() == hash_to_scalar(b"rs", b"1")


def test_get_points_deterministic_on_curve():
    pts = take_points(b"test points", 10)
    assert all(ec.is_on_curve(p) for p in pts)
    # regenerate -> identical
    assert pts == take_points(b"test points", 10)
    # principal root property: y = (x^3+7)^((q+1)/4)
    for x, y in pts:
        assert y == pow((x * x * x + 7) % Q, (Q + 1) // 4, Q)


def test_bit_pack_roundtrip():
    bits = [True, False, False, True, True, False, True, False, True, True]
    packed = bit_pack(bits)
    assert len(packed) == 2
    assert bit_unpack(packed)[: len(bits)] == bits
    assert packed[0] & 1 == 1  # LSB-first


def test_commitments_roundtrip():
    pts = take_points(b"enc", 11)
    data = encode_commitments(pts)
    assert len(data) == 2 + 32 * 11
    out, off = decode_commitments(11, data)
    assert out == pts and off == len(data)


def test_scalars_points_roundtrip():
    pts = take_points(b"enc2", 3)
    scs = [123456789, R - 1, 0]
    data = encode_scalars_points(scs, pts)
    out = decode_scalars_points(3, 3, data)
    assert out is not None
    assert out[0] == scs and out[1] == pts
