"""Lockstep batch prover: byte-identical to sequential proving
(reference per-phase commitment structure makes the fusion legal,
reference: src/RangeProof/TypedReciprocal.hs:399-444)."""

import pytest

import test_examples_e2e as ex
from bulletproofspp_tpu.cli import _resolve_values
from bulletproofspp_tpu.core import range_proof as rpm
from bulletproofspp_tpu.core.engine import HostEngine
from bulletproofspp_tpu.core.lockstep import prove_lockstep
from bulletproofspp_tpu.core.transcript import take_points
from bulletproofspp_tpu.io_ import schema as schema_mod

ENGINE = HostEngine()


def _setup(spec_obj):
    spec = schema_mod.parse_spec(spec_obj)
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    return spec, schema_mod.build_setup(spec, points)


def _vals(spec, wit):
    return _resolve_values(spec, schema_mod.parse_witness(wit))


@pytest.mark.parametrize("spec_obj,wit_base", [(ex.EX_64BIT, ex.WIT_64BIT), (ex.EX_REC, ex.WIT_REC)])
def test_lockstep_matches_sequential(spec_obj, wit_base):
    spec, setup = _setup(spec_obj)
    items = []
    for i in range(4):
        wit = [dict(w) for w in wit_base]
        if spec_obj is ex.EX_64BIT:
            wit[0]["amount"] = 10_000 + i
        items.append((_vals(spec, wit), f"seed{i}".encode()))
    sequential = [rpm.prove(setup, v, s, ENGINE) for v, s in items]
    lock = prove_lockstep(setup, items, ENGINE)
    for a, b in zip(sequential, lock):
        assert rpm.encode_proof(setup, a) == rpm.encode_proof(setup, b)
    for p in lock:
        assert rpm.verify(setup, p, ENGINE)


def test_lockstep_bad_witness_poisons_cleanly():
    spec, setup = _setup(ex.EX_32BIT)
    good = (_vals(spec, [{"amount": 10}]), b"s0")
    bad = (_vals(spec, [{"amount": 2**62}]), b"s1")  # out of 32-bit range
    with pytest.raises(ValueError):
        prove_lockstep(setup, [good, bad, good], ENGINE)


def test_lockstep_single_and_empty():
    spec, setup = _setup(ex.EX_32BIT)
    assert prove_lockstep(setup, [], ENGINE) == []
    [p] = prove_lockstep(setup, [(_vals(spec, [{"amount": 5}]), b"z")], ENGINE)
    assert rpm.verify(setup, p, ENGINE)


def test_fold_bv_many_matches_fold_bv():
    """The vmapped fused fold must be bit-identical per entry."""
    from bulletproofspp_tpu.core import ec
    from bulletproofspp_tpu.ops.engine import JaxEngine

    eng = JaxEngine(host_below=0)
    import random as _r

    r = _r.Random(3)
    calls = []
    for i in range(3):
        even = [ec.scalar_mul(r.randrange(1, ec.R), ec.G) for _ in range(5)]
        odd = [ec.scalar_mul(r.randrange(1, ec.R), ec.G) for _ in range(4)]
        calls.append((r.randrange(1, 2**120), r.randrange(1, 2**120), even, odd))
    fused = eng.fold_bv_many(calls)
    for call, got in zip(calls, fused):
        want = eng.fold_bv(*call)
        assert got.to_host() == want.to_host()


def test_complete_square_many_matches_single():
    from bulletproofspp_tpu.core import ec
    from bulletproofspp_tpu.ops.engine import JaxEngine

    eng = JaxEngine(host_below=0)
    import random as _r

    r = _r.Random(9)
    calls = []
    for i in range(3):
        g0 = [ec.scalar_mul(r.randrange(1, ec.R), ec.G) for _ in range(4)]
        g1 = [ec.scalar_mul(r.randrange(1, ec.R), ec.G) for _ in range(3)]
        calls.append((r.randrange(1, ec.R), g0, g1))
    fused = eng.complete_square_many(calls)
    for call, (gx, hy) in zip(calls, fused):
        wgx, why = eng.complete_square(*call)
        assert gx.to_host() == wgx.to_host()
        assert hy.to_host() == why.to_host()
