"""Batched device point decompression + decode-and-batch-verify from
wire bytes (VERDICT r1 item 4: the 1024-proof showcase path; device
equivalent of fastSqrt, reference:
src/Data/Field/Galois/FastPrime.hs:213-218)."""

import random

import pytest

import test_examples_e2e as ex
from bulletproofspp_tpu.cli import _resolve_values
from bulletproofspp_tpu.core import ec
from bulletproofspp_tpu.core import range_proof as rpm
from bulletproofspp_tpu.core.batch import batch_verify_encoded
from bulletproofspp_tpu.core.encoding import x_and_sign
from bulletproofspp_tpu.core.engine import HostEngine
from bulletproofspp_tpu.core.transcript import take_points
from bulletproofspp_tpu.io_ import schema as schema_mod

ENGINE = HostEngine()
rng = random.Random(5)


def test_device_decompress_matches_host():
    from bulletproofspp_tpu.ops.engine import JaxEngine

    pts = [ec.scalar_mul(rng.randrange(1, ec.R), ec.G) for _ in range(40)]
    xs, signs = zip(*[x_and_sign(p) for p in pts])
    xs, signs = list(xs), list(signs)
    x = 5  # append non-residue x's: must decode to None
    while len(xs) < 45:
        if ec.point_x(x) is None:
            xs.append(x)
            signs.append(False)
        x += 1
    want = ENGINE.decompress(xs, signs)
    got = JaxEngine(host_below=0).decompress(xs, signs)
    assert got == want
    assert want[:40] == pts
    assert want[40:] == [None] * 5


def _mk(spec_obj, wit, seed):
    spec = schema_mod.parse_spec(spec_obj)
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    setup = schema_mod.build_setup(spec, points)
    values = _resolve_values(spec, schema_mod.parse_witness(wit))
    proof = rpm.prove(setup, values, seed, ENGINE)
    coms_b, proof_b = rpm.encode_proof(setup, proof)
    return setup, coms_b, proof_b


def test_batch_verify_encoded_small():
    entries = [
        _mk(ex.EX_32BIT, ex.WIT_32BIT, b"a"),
        _mk(ex.EX_64BIT, ex.WIT_64BIT, b"b"),
        _mk(ex.EX_REC, ex.WIT_REC, b"c"),
    ]
    assert batch_verify_encoded(entries, ENGINE)
    # corrupt one byte of one proof -> reject
    setup, coms_b, proof_b = entries[1]
    bad = bytearray(proof_b)
    bad[16] ^= 1
    entries_bad = [entries[0], (setup, coms_b, bytes(bad)), entries[2]]
    assert batch_verify_encoded(entries_bad, ENGINE) is False
    # truncated bytes -> reject (parse failure)
    entries_trunc = [entries[0], (setup, coms_b, proof_b[:-7])]
    assert batch_verify_encoded(entries_trunc, ENGINE) is False
    assert batch_verify_encoded([], ENGINE)


@pytest.mark.slow
def test_batch_verify_encoded_n64():
    """64 same-schema proofs decoded and verified as one batch (the
    scaled-down n=1024 showcase; full scale runs in bench.py)."""
    spec = schema_mod.parse_spec(ex.EX_64BIT)
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    setup = schema_mod.build_setup(spec, points)
    entries = []
    for i in range(64):
        values = _resolve_values(spec, schema_mod.parse_witness([{"amount": 10_000 + i}]))
        proof = rpm.prove(setup, values, f"s{i}".encode(), ENGINE)
        coms_b, proof_b = rpm.encode_proof(setup, proof)
        entries.append((setup, coms_b, proof_b))
    assert batch_verify_encoded(entries, ENGINE)
    setup0, coms_b, proof_b = entries[13]
    bad = bytearray(proof_b)
    bad[40] ^= 4
    entries[13] = (setup0, coms_b, bytes(bad))
    assert batch_verify_encoded(entries, ENGINE) is False
