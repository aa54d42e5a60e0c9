"""Randomized-schema property e2e — the reference's *intended* Spec.hs
strategy (SURVEY §4: property tests over random configurations; the
reference's actual Spec.hs is stale and does not compile against its own
API).  A deterministic PRNG sweeps the schema space — binary vs
typed-reciprocal, NL vs IP argument, random bases/digit counts/min
offsets, shared digits, typed conservation — and every generated pair
must prove, verify, survive a wire round trip, and reject a random
byte flip (reference: app/Parse.hs:88-172 for the schema space;
src/RangeProof/{Binary,TypedReciprocal}.hs for the protocol classes)."""

import random

from bulletproofspp_tpu.cli import _resolve_values
from bulletproofspp_tpu.core import range_proof as rpm
from bulletproofspp_tpu.core.engine import HostEngine
from bulletproofspp_tpu.core.transcript import take_points
from bulletproofspp_tpu.io_ import schema as schema_mod

ENGINE = HostEngine()
N_CASES = 10


def _gen_case(rng: random.Random):
    """One random (schema_obj, witness_list) pair, valid by construction."""
    arg = rng.choice(["NL", "IP"])
    spec = {"basisSeed": f"prop {rng.randrange(10**9)}", "argument": arg}
    kind = rng.random()
    if kind < 0.3:
        # binary proof: random widths and offsets
        spec["binary"] = True
        ranges, wit = [], []
        for _ in range(rng.randint(1, 3)):
            width = rng.randint(2, 48)
            rmin = rng.randrange(1000)
            ranges.append({"min": rmin, "max": rmin + 2**width})
            wit.append({"amount": rng.choice(
                [rmin, rmin + 2**width - 1, rmin + 2**(width - 1),  # midpoint: D2
                 rng.randint(rmin, rmin + 2**width - 1)])})
        spec["ranges"] = ranges
        return spec, wit
    if kind < 0.6:
        # typed + conserved: one input/output pair per type, balanced
        spec["typed"] = True
        ranges, wit = [], []
        for t in range(rng.randint(1, 2)):
            base = rng.choice([4, 9, 16])
            digits = rng.randint(1, 3)
            width = base**digits
            rmin = rng.randrange(100)
            amt = rng.randint(rmin, rmin + width - 1)
            for is_out in (False, True):
                ranges.append({"base": base, "min": rmin, "max": rmin + width,
                               "isOutput": is_out})
                wit.append({"amount": amt, "type": t + 1})
        spec["ranges"] = ranges
        return spec, wit
    # plain reciprocal: random bases, occasional shared digits
    ranges, wit = [], []
    shared_base = rng.choice([4, 16]) if rng.random() < 0.5 else None
    for _ in range(rng.randint(1, 3)):
        if shared_base is not None and rng.random() < 0.7:
            base = shared_base
            is_shared = True
        else:
            base = rng.choice([4, 9, 16, 32])
            is_shared = False
        digits = rng.randint(1, 3)
        width = base**digits
        rmin = rng.randrange(1000)
        r = {"base": base, "min": rmin, "max": rmin + width}
        if is_shared:
            r["isShared"] = True
        ranges.append(r)
        wit.append({"amount": rng.randint(rmin, rmin + width - 1)})
    spec["ranges"] = ranges
    return spec, wit


def _roundtrip_and_tamper(spec_obj, wit, rng):
    spec = schema_mod.parse_spec(spec_obj)
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    setup = schema_mod.build_setup(spec, points)
    vals = _resolve_values(spec, schema_mod.parse_witness(wit))
    pr = rpm.prove(setup, vals, b"prop seed", ENGINE)
    assert rpm.verify(setup, pr, ENGINE), spec_obj
    cb, pb = rpm.encode_proof(setup, pr)
    rt = rpm.decode_proof(setup, cb, pb, ENGINE)
    assert rt is not None and rpm.verify(setup, rt, ENGINE), spec_obj
    bad = bytearray(pb)
    bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
    rt_bad = rpm.decode_proof(setup, cb, bytes(bad), ENGINE)
    assert rt_bad is None or not rpm.verify(setup, rt_bad, ENGINE), spec_obj


def test_random_schema_sweep():
    rng = random.Random(0xB1E55)
    for i in range(N_CASES):
        spec_obj, wit = _gen_case(rng)
        _roundtrip_and_tamper(spec_obj, wit, rng)


def test_random_schemas_through_multiparty_prover():
    """The multiparty prover on random schemas (both protocol families):
    a random partition of the ranges across 1-3 parties must produce a
    proof the plain verifier accepts, and — with one party owning
    everything under the schema's seed — byte-identical output to the
    single prover (the MPC decomposition is exact)."""
    from test_mp_prove import _run_mp

    rng = random.Random(0x3A9B)
    done = 0
    while done < 6:
        spec_obj, wit = _gen_case(rng)
        spec = schema_mod.parse_spec(spec_obj)
        points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
        setup = schema_mod.build_setup(spec, points)
        vals = _resolve_values(spec, schema_mod.parse_witness(wit))
        n = len(vals)
        # random partition into 1..min(3, n) non-empty parts
        idx = list(range(n))
        rng.shuffle(idx)
        n_parties = rng.randint(1, min(3, n))
        parts = [idx[k::n_parties] for k in range(n_parties)]
        proof = _run_mp(setup, vals, parts)
        assert rpm.verify(setup, proof, ENGINE), (spec_obj, parts)
        if n_parties == 1:
            solo = rpm.prove(setup, vals, b"mp party 0", ENGINE)
            assert rpm.encode_proof(setup, proof) == rpm.encode_proof(setup, solo)
        done += 1


def test_random_schemas_through_serving_paths():
    """The serving path on random MIXED schemas: prove_many must be
    byte-identical to sequential proving, and verify_many_encoded must
    confirm all and localize exactly a tampered one."""
    from bulletproofspp_tpu.core.batch import verify_many_encoded
    from bulletproofspp_tpu.core.lockstep import prove_many

    rng = random.Random(0xD1CE)
    items, setups = [], []
    for _ in range(6):
        spec_obj, wit = _gen_case(rng)
        spec = schema_mod.parse_spec(spec_obj)
        points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
        setup = schema_mod.build_setup(spec, points)
        vals = _resolve_values(spec, schema_mod.parse_witness(wit))
        items.append((setup, vals, b"serve" + bytes([len(items)])))
        setups.append(setup)

    fused = prove_many(items, ENGINE)
    encoded = []
    for (setup, vals, seed), proof in zip(items, fused):
        solo = rpm.prove(setup, vals, seed, ENGINE)
        assert rpm.encode_proof(setup, proof) == rpm.encode_proof(setup, solo)
        encoded.append((setup, *rpm.encode_proof(setup, proof)))

    assert verify_many_encoded(encoded, ENGINE) == [True] * len(encoded)
    s, c, p = encoded[3]
    bad = bytearray(p)
    bad[rng.randrange(len(bad))] ^= 1 << rng.randrange(8)
    tampered = encoded[:3] + [(s, c, bytes(bad))] + encoded[4:]
    assert verify_many_encoded(tampered, ENGINE) == [True, True, True, False, True, True]
