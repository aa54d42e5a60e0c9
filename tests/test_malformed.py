"""Verification must return False — never raise — on structurally
malformed proofs fed through the library API (VERDICT r1 item 9;
reference: src/RangeProof.hs:68-85 performs this validation decode-side,
which guards only the CLI path)."""

import pytest

import test_examples_e2e as ex
from bulletproofspp_tpu.cli import _resolve_values
from bulletproofspp_tpu.core import range_proof as rpm
from bulletproofspp_tpu.core.bulletproof import BPProof
from bulletproofspp_tpu.core.engine import HostEngine
from bulletproofspp_tpu.core.range_proof import RangeProof
from bulletproofspp_tpu.core.transcript import take_points
from bulletproofspp_tpu.io_ import schema as schema_mod

ENGINE = HostEngine()


def _mk(spec_obj, wit_obj):
    spec = schema_mod.parse_spec(spec_obj)
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    setup = schema_mod.build_setup(spec, points)
    values = _resolve_values(spec, schema_mod.parse_witness(wit_obj))
    proof = rpm.prove(setup, values, spec.random_seed.encode(), ENGINE)
    return setup, proof


@pytest.fixture(scope="module")
def binary_case():
    return _mk(ex.EX_BIN, ex.WIT_BIN)


@pytest.fixture(scope="module")
def trrp_case():
    return _mk(ex.EX_REC, ex.WIT_REC)


def _mutants(good):
    """Structural corruptions of a valid RangeProof."""
    bp = good.bp
    yield RangeProof([], good.input_coms, bp)                      # truncated rp coms
    yield RangeProof(good.rp_coms * 2, good.input_coms, bp)        # oversized rp coms
    yield RangeProof(good.rp_coms, [], bp)                         # truncated input coms
    yield RangeProof(good.rp_coms, good.input_coms * 3, bp)        # oversized input coms
    yield RangeProof(good.rp_coms[:-1], good.input_coms, bp)       # off by one
    yield RangeProof(good.rp_coms, good.input_coms,
                     BPProof(bp.responses[:-1], bp.wit_scalars))   # missing round
    yield RangeProof(good.rp_coms, good.input_coms,
                     BPProof(bp.responses + [bp.responses[0]], bp.wit_scalars))  # extra round
    yield RangeProof(good.rp_coms, good.input_coms,
                     BPProof([r[0] for r in bp.responses], bp.wit_scalars))  # not pairs
    yield RangeProof(good.rp_coms, good.input_coms,
                     BPProof([(bp.responses[0][0],)] + bp.responses[1:],
                             bp.wit_scalars))                      # 1-tuple response
    yield RangeProof(good.rp_coms, good.input_coms,
                     BPProof(bp.responses, bp.wit_scalars[:-1]))   # short opening
    yield RangeProof(good.rp_coms, good.input_coms,
                     BPProof(bp.responses, bp.wit_scalars + [1]))  # long opening
    yield RangeProof(good.rp_coms, good.input_coms,
                     BPProof(bp.responses, ["junk"] * len(bp.wit_scalars)))  # garbage scalars
    yield RangeProof(good.rp_coms, good.input_coms,
                     BPProof(bp.responses, []))                    # empty opening


def test_binary_malformed_rejected(binary_case):
    setup, good = binary_case
    assert rpm.verify(setup, good, ENGINE)
    for i, bad in enumerate(_mutants(good)):
        assert rpm.verify(setup, bad, ENGINE) is False, f"mutant {i}"


def test_trrp_malformed_rejected(trrp_case):
    setup, good = trrp_case
    assert rpm.verify(setup, good, ENGINE)
    for i, bad in enumerate(_mutants(good)):
        assert rpm.verify(setup, bad, ENGINE) is False, f"mutant {i}"


def test_batch_malformed_rejected(binary_case, trrp_case):
    from bulletproofspp_tpu.core.batch import batch_verify

    setup_b, good_b = binary_case
    setup_t, good_t = trrp_case
    assert batch_verify([(setup_b, good_b), (setup_t, good_t)], ENGINE)
    for bad in _mutants(good_t):
        assert batch_verify([(setup_b, good_b), (setup_t, bad)], ENGINE) is False
