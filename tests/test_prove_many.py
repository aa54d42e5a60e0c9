"""Schema-bucketed mixed-batch prover (VERDICT r2 item 4): prove_many
groups arbitrary (setup, values, seed) items by fusion signature, runs
one lockstep rendezvous per bucket, and must be byte-identical to
sequential proving (reference legality argument:
src/RangeProof/TypedReciprocal.hs:399-444 — the per-phase commitment
structure fixes the engine-call sequence per schema)."""

import test_examples_e2e as ex
from bulletproofspp_tpu.cli import _resolve_values
from bulletproofspp_tpu.core import range_proof as rpm
from bulletproofspp_tpu.core.engine import HostEngine
from bulletproofspp_tpu.core.lockstep import _chunks_pow2, fusion_signature, prove_many
from bulletproofspp_tpu.core.transcript import take_points
from bulletproofspp_tpu.io_ import schema as schema_mod

ENGINE = HostEngine()


def _setup(spec_obj, seed=None):
    spec = schema_mod.parse_spec(spec_obj)
    basis = (seed if seed is not None else spec.basis_seed).encode()
    points = take_points(basis, schema_mod.points_needed(spec))
    return spec, schema_mod.build_setup(spec, points)


def _vals(spec, wit):
    return _resolve_values(spec, schema_mod.parse_witness(wit))


def _items(spec_obj, wit_base, setup_seed, n, tag):
    spec, setup = _setup(spec_obj, setup_seed)
    out = []
    for i in range(n):
        wit = [dict(w) for w in wit_base]
        out.append((setup, _vals(spec, wit), f"{tag}{i}".encode()))
    return out


def test_chunks_pow2():
    assert [len(c) for c in _chunks_pow2(list(range(13)), 16)] == [8, 4, 1]
    assert [len(c) for c in _chunks_pow2(list(range(16)), 16)] == [16]
    assert [len(c) for c in _chunks_pow2(list(range(37)), 16)] == [16, 16, 4, 1]
    assert _chunks_pow2([], 16) == []
    # chunks partition the input in order
    assert sum(_chunks_pow2(list(range(13)), 16), []) == list(range(13))


def test_signature_groups_same_schema_across_basis_seeds():
    _, s1 = _setup(ex.EX_32BIT, "seedA")
    _, s2 = _setup(ex.EX_32BIT, "seedB")
    assert s1 is not s2
    assert fusion_signature(s1) == fusion_signature(s2)


def test_signature_separates_different_schemas():
    sigs = {fusion_signature(_setup(e)[1]) for e in (ex.EX_32BIT, ex.EX_64BIT, ex.EX_BIN, ex.EX_REC)}
    assert len(sigs) == 4


def test_prove_many_mixed_schemas_matches_sequential():
    """Interleaved 32bit / 64bit / rec_test / bin_test items, including
    two DIFFERENT setups of the same 32bit schema (they must fuse)."""
    items = []
    items += _items(ex.EX_32BIT, ex.WIT_32BIT, "sA", 2, "a")
    items += _items(ex.EX_64BIT, ex.WIT_64BIT, None, 3, "b")
    items += _items(ex.EX_32BIT, ex.WIT_32BIT, "sB", 1, "c")  # same schema, other basis
    items += _items(ex.EX_REC, ex.WIT_REC, None, 2, "d")
    items += _items(ex.EX_BIN, ex.WIT_BIN, None, 1, "e")
    # shuffle deterministically so buckets interleave
    order = [4, 0, 7, 2, 5, 8, 1, 6, 3]
    items = [items[i] for i in order]

    sequential = [rpm.prove(s, v, seed, ENGINE) for s, v, seed in items]
    batched = prove_many(items, ENGINE)
    assert len(batched) == len(items)
    for (setup, _v, _s), a, b in zip(items, sequential, batched):
        assert rpm.encode_proof(setup, a) == rpm.encode_proof(setup, b)
        assert rpm.verify(setup, b, ENGINE)


def test_prove_many_nonpow2_single_schema():
    items = _items(ex.EX_32BIT, ex.WIT_32BIT, None, 5, "x")  # chunks 4 + 1
    sequential = [rpm.prove(s, v, seed, ENGINE) for s, v, seed in items]
    batched = prove_many(items, ENGINE)
    for (setup, _v, _s), a, b in zip(items, sequential, batched):
        assert rpm.encode_proof(setup, a) == rpm.encode_proof(setup, b)


def test_prove_many_empty_and_single():
    assert prove_many([], ENGINE) == []
    [(setup, v, s)] = _items(ex.EX_32BIT, ex.WIT_32BIT, None, 1, "z")
    [p] = prove_many([(setup, v, s)], ENGINE)
    assert rpm.verify(setup, p, ENGINE)
