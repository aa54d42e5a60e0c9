"""Random-linear-combination batch verification (the reference's TODO,
reference: README.md:186, src/RangeProof.hs:103-106)."""

from bulletproofspp_tpu.cli import _resolve_values
from bulletproofspp_tpu.core import range_proof as rpm
from bulletproofspp_tpu.core.batch import batch_verify
from bulletproofspp_tpu.core.bulletproof import BPProof
from bulletproofspp_tpu.core.engine import HostEngine
from bulletproofspp_tpu.core.range_proof import RangeProof
from bulletproofspp_tpu.core.transcript import take_points
from bulletproofspp_tpu.io_ import schema as schema_mod

ENGINE = HostEngine()

SPEC = {
    "basisSeed": "test points",
    "ranges": [{"base": 9, "min": 0, "max": 4294967296, "isOutput": True}],
}


def _mk(amount, seed):
    spec = schema_mod.parse_spec(SPEC)
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    setup = schema_mod.build_setup(spec, points)
    values = _resolve_values(spec, schema_mod.parse_witness([{"amount": amount}]))
    proof = rpm.prove(setup, values, seed, ENGINE)
    return setup, proof


def test_batch_verify_accepts_valid():
    items = [_mk(10_000, b"s1"), _mk(777, b"s2"), _mk(2**31, b"s3")]
    assert batch_verify(items, ENGINE)


def test_batch_verify_rejects_one_bad():
    items = [_mk(10_000, b"s1"), _mk(777, b"s2")]
    setup, good = items[1]
    bad_scalars = [good.bp.wit_scalars[0] + 1] + good.bp.wit_scalars[1:]
    bad = RangeProof(good.rp_coms, good.input_coms, BPProof(good.bp.responses, bad_scalars))
    assert not batch_verify([items[0], (setup, bad)], ENGINE)


def test_batch_verify_empty():
    assert batch_verify([], ENGINE)


def test_batch_verify_duplicate_identical_proofs():
    # a batch containing the SAME proof twice must still verify (the rho
    # weights differ per index, so duplicates do not cancel)
    setup, proof = _mk(10_000, b"s1")
    assert batch_verify([(setup, proof), (setup, proof), _mk(777, b"s2")], ENGINE)


def test_batch_verify_duplicate_with_bitflip_rejects():
    # duplicating a proof and flipping one scalar bit in the copy must
    # reject: the copies get independent rhos, so the flip cannot cancel
    setup, good = _mk(10_000, b"s1")
    s0 = good.bp.wit_scalars[0]
    bad_scalars = [type(s0)(int(s0) ^ 1)] + good.bp.wit_scalars[1:]
    bad = RangeProof(good.rp_coms, good.input_coms, BPProof(good.bp.responses, bad_scalars))
    assert not batch_verify([(setup, good), (setup, bad)], ENGINE)


def test_batch_verify_handbuilt_garbage_rejects_not_raises():
    """A structurally garbage RangeProof object (non-iterable coms, bp
    without responses) must reject the batch, never raise."""
    setup, good = _mk(123, b"g")
    for bad in (
        RangeProof(None, [], None),
        RangeProof(good.rp_coms, good.input_coms, object()),
        RangeProof(good.rp_coms[:-1], good.input_coms, good.bp),
    ):
        assert batch_verify([(setup, good), (setup, bad)], ENGINE) is False
