"""Full-protocol e2e through the JAX engine: proofs produced with the
device engine must be byte-identical to host-engine proofs (transcripts
pin every commitment), and batch verification must run on the sharded
engine over the 8-device CPU mesh."""

import pytest

jax = pytest.importorskip("jax")

from bulletproofspp_tpu.cli import _resolve_values
from bulletproofspp_tpu.core import range_proof as rpm
from bulletproofspp_tpu.core.engine import HostEngine
from bulletproofspp_tpu.core.transcript import take_points
from bulletproofspp_tpu.io_ import schema as schema_mod

HOST = HostEngine()

SPEC_32 = {
    "basisSeed": "test points",
    "ranges": [{"base": 9, "min": 0, "max": 4294967296, "isOutput": True}],
}


def _setup(spec_obj):
    spec = schema_mod.parse_spec(spec_obj)
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    return spec, schema_mod.build_setup(spec, points)


def _prove(spec, setup, wit, seed, engine):
    values = _resolve_values(spec, schema_mod.parse_witness(wit))
    return rpm.prove(setup, values, seed, engine)


@pytest.mark.slow
def test_jax_engine_proof_bytes_match_host():
    from bulletproofspp_tpu.ops.engine import JaxEngine

    spec, setup = _setup(SPEC_32)
    wit = [{"amount": 10000}]
    want = rpm.encode_proof(setup, _prove(spec, setup, wit, b"seed", HOST))
    got = rpm.encode_proof(setup, _prove(spec, setup, wit, b"seed", JaxEngine(host_below=0)))
    assert got == want
    # and the device engine verifies host proofs
    proof = _prove(spec, setup, wit, b"seed", HOST)
    assert rpm.verify(setup, proof, JaxEngine(host_below=0))


@pytest.mark.slow
def test_jax_engine_odd_length_fold():
    """A 3-range typed-reciprocal config produces odd-length basis vectors,
    exercising the None-padded fold path (reference: mapHalves default,
    src/Bulletproof.hs:63-75)."""
    from bulletproofspp_tpu.ops.engine import JaxEngine

    spec_obj = {
        "typed": True,
        "basisSeed": "test points",
        "ranges": [
            {"base": 3, "min": 0, "max": 2**64, "isShared": True, "isOutput": True},
            {"base": 5, "min": 1, "max": 625, "isShared": False, "isAssumed": True, "isOutput": False},
        ],
    }
    wit = [{"amount": 124, "type": 15}, {"amount": 124, "type": 15}]
    spec, setup = _setup(spec_obj)
    want = rpm.encode_proof(setup, _prove(spec, setup, wit, b"s", HOST))
    got = rpm.encode_proof(setup, _prove(spec, setup, wit, b"s", JaxEngine(host_below=0)))
    assert got == want


@pytest.mark.slow
def test_sharded_engine_batch_verify():
    from bulletproofspp_tpu.core.batch import batch_verify
    from bulletproofspp_tpu.ops import sharded
    from bulletproofspp_tpu.ops.engine import ShardedJaxEngine

    assert len(jax.devices()) >= 8
    mesh = sharded.make_mesh(jax.devices()[:8], win=2)
    engine = ShardedJaxEngine(mesh=mesh, host_below=0, shard_above=64)
    spec, setup = _setup(SPEC_32)
    items = [
        (setup, _prove(spec, setup, [{"amount": 10_000 + i}], f"s{i}".encode(), HOST))
        for i in range(3)
    ]
    assert batch_verify(items, engine)
