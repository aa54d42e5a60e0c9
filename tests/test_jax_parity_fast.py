"""Default-suite JaxEngine byte-parity gate (VERDICT r1 item 7).

The slow suite covers full-size schemas; this test keeps ONE
device-engine proof-byte comparison in the default gate so a regression
that diverges JaxEngine proof bytes from HostEngine cannot land green.
The schema is the smallest that still exercises the real device path
(host_below=0: every MSM, fold, and table build runs through the JAX
kernels): a single 4-bit binary range, ~40 s of XLA CPU compiles.
"""

import pytest

jax = pytest.importorskip("jax")

from bulletproofspp_tpu.cli import _resolve_values
from bulletproofspp_tpu.core import range_proof as rpm
from bulletproofspp_tpu.core.engine import HostEngine
from bulletproofspp_tpu.core.transcript import take_points
from bulletproofspp_tpu.io_ import schema as schema_mod

SPEC = {
    "binary": True,
    "basisSeed": "test points",
    "ranges": [{"min": 0, "max": 16, "isOutput": True}],
}


def test_jax_engine_proof_bytes_match_host_fast():
    from bulletproofspp_tpu.ops.engine import JaxEngine

    spec = schema_mod.parse_spec(SPEC)
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    setup = schema_mod.build_setup(spec, points)
    values = _resolve_values(spec, schema_mod.parse_witness([{"amount": 7}]))
    want = rpm.encode_proof(setup, rpm.prove(setup, values, b"seed", HostEngine()))
    got = rpm.encode_proof(setup, rpm.prove(setup, values, b"seed", JaxEngine(host_below=0)))
    assert got == want
