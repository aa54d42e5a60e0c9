"""End-to-end prove/verify over the reference's example configurations
(reference: examples/*/schema.json, exercised via CLI `test` mode,
reference: app/Main.hs:150-152)."""

import json
import os

import pytest

from bulletproofspp_tpu.core import range_proof as rpm
from bulletproofspp_tpu.core.engine import HostEngine
from bulletproofspp_tpu.core.transcript import take_points
from bulletproofspp_tpu.io_ import schema as schema_mod
from bulletproofspp_tpu.cli import _resolve_values

ENGINE = HostEngine()

_EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "examples")


def load_example(name):
    """(schema_obj, witness_obj) parsed from the shipped byte-identical
    reference fixtures (reference: examples/<name>/{schema,witness}.json)."""
    with open(os.path.join(_EXAMPLES_DIR, name, "schema.json")) as f:
        spec = json.load(f)
    with open(os.path.join(_EXAMPLES_DIR, name, "witness.json")) as f:
        wit = json.load(f)
    return spec, wit


EX_32BIT, WIT_32BIT = load_example("32bit")
EX_64BIT, WIT_64BIT = load_example("64bit")
EX_BIN, WIT_BIN = load_example("bin_test")
EX_REC, WIT_REC = load_example("rec_test")


def agg_example(count, base):
    """The shipped aggregated fixture examples/<count>by64 (asserted to
    carry the requested shape, so a drifted fixture fails loudly)."""
    spec, wit = load_example(f"{count}by64")
    r = spec["ranges"][0]
    assert r["count"] == count and r["base"] == base and len(wit) == count
    return spec, wit


def run_example(spec_obj, wit_obj, expect_bytes=None):
    spec = schema_mod.parse_spec(spec_obj)
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    setup = schema_mod.build_setup(spec, points)
    values = _resolve_values(spec, schema_mod.parse_witness(wit_obj))
    proof = rpm.prove(setup, values, spec.random_seed.encode(), ENGINE)
    assert rpm.verify(setup, proof, ENGINE)
    coms_bytes, proof_bytes = rpm.encode_proof(setup, proof)
    if expect_bytes is not None:
        assert len(proof_bytes) == expect_bytes
    dec = rpm.decode_proof(setup, coms_bytes, proof_bytes)
    assert dec is not None
    assert rpm.verify(setup, dec, ENGINE)
    # tampered proof must fail
    bad_scalars = [dec.bp.wit_scalars[0] + 1] + dec.bp.wit_scalars[1:]
    from bulletproofspp_tpu.core.bulletproof import BPProof
    from bulletproofspp_tpu.core.range_proof import RangeProof

    bad = RangeProof(dec.rp_coms, dec.input_coms, BPProof(dec.bp.responses, bad_scalars))
    assert not rpm.verify(setup, bad, ENGINE)
    return setup, proof, proof_bytes


def test_32bit():
    run_example(EX_32BIT, WIT_32BIT)


def test_64bit_headline_size():
    # 3 scalars + 10 points + 2 sign bytes = 418 (the paper's 416 counts 13x32)
    run_example(EX_64BIT, WIT_64BIT, expect_bytes=418)


def test_bin_test():
    run_example(EX_BIN, WIT_BIN)


def test_bin_test_ip_variant():
    obj = dict(EX_BIN)
    obj["argument"] = "IP"
    run_example(obj, WIT_BIN)


def test_rec_test():
    run_example(EX_REC, WIT_REC)


def test_rec_test_nl_variant():
    obj = dict(EX_REC)
    obj["argument"] = "NL"
    run_example(obj, WIT_REC)


def test_32by64_aggregated():
    spec, wit = agg_example(32, 64)
    run_example(spec, wit)


@pytest.mark.slow
def test_64by64_aggregated():
    spec, wit = agg_example(64, 256)
    run_example(spec, wit)


@pytest.mark.slow
def test_96by64_aggregated():
    # (examples/96by64): 96 shared-digit 64-bit ranges, base 256, NL argument
    spec, wit = agg_example(96, 256)
    run_example(spec, wit)


@pytest.mark.slow
def test_128by64_aggregated():
    # the reference's largest example (examples/128by64): 128 shared-digit
    # 64-bit ranges, NL argument
    spec, wit = agg_example(128, 256)
    run_example(spec, wit)


def test_conservation_violation_rejected():
    spec = schema_mod.parse_spec(EX_REC)
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    setup = schema_mod.build_setup(spec, points)
    bad_wit = [{"amount": 124, "type": 15}, {"amount": 2, "type": 15}, {"amount": 122, "type": 15}]
    values = _resolve_values(spec, schema_mod.parse_witness(bad_wit))
    assert setup.witness(values) is None


def test_out_of_range_rejected():
    spec = schema_mod.parse_spec(EX_32BIT)
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    setup = schema_mod.build_setup(spec, points)
    values = _resolve_values(spec, schema_mod.parse_witness([{"amount": 2**33}]))
    assert setup.witness(values) is None
