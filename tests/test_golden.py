"""Golden transcript/proof-byte regression tests.

The reference's determinism contract: identical seeds => identical
transcripts, proof bytes, and commitment bytes (SURVEY §4; everything is
derandomized through basisSeed / randomSeed / SHA challenges,
reference: app/Main.hs:68-87, src/ZKP.hs:90-101).  These digests pin the
framework's own wire format so any change to the transcript encoding,
oracle ordering, digit planners, or serialization is caught immediately.

Cases are the SHIPPED fixtures under examples/ — byte-identical copies
of the reference's examples/ (checked by test_examples_match_reference)
— parsed from disk, so the files a user actually receives are what the
goldens pin.

PROVENANCE: these hashes are framework-generated, NOT produced by the
Haskell reference (no GHC toolchain or network exists in this
environment — see docs/UPSTREAM_SEMANTICS.md for the build-attempt
record).  Reference interop rests on the assumption registry in that
file: every byte-format semantic is pinned to quoted reference source,
vendored upstream declarations, or a mathematical argument, each with
its own test in tests/test_upstream_semantics.py.
"""

import filecmp
import hashlib
import json
import pathlib

import pytest

from bulletproofspp_tpu.cli import _resolve_values
from bulletproofspp_tpu.core import range_proof as rpm
from bulletproofspp_tpu.core.engine import HostEngine
from bulletproofspp_tpu.core.transcript import take_points
from bulletproofspp_tpu.io_ import schema as schema_mod

ENGINE = HostEngine()

EXAMPLES_DIR = pathlib.Path(__file__).resolve().parent.parent / "examples"
REFERENCE_EXAMPLES = pathlib.Path("/root/reference/examples")

GOLDEN = {
    "32bit": ("49602ab782f3dc35343b615c0f85010e7d050fcd16444dca82b07acaa4fb3c5b",
              "ddc048e1dd7c0a88bbcadb02cd4f80d3598a45bb90edd8d05c575da4d723b080", 418),
    "64bit": ("fe39faef84b016b82b017a4ef07ba3f31c5237b0f79c0653376c86f5dbba8c5d",
              "fd56b4b18729678d4f77a64644771f77ebaf38f686da8523a3fdebcb2d29c8ee", 418),
    "bin_test": ("a655cf19e486b20d72a123fa07f0abdff9d3abdd6f6b4c4bbe5c3114cdc19c69",
                 "ec4cf94ed5ada8bd356e990a4b95eb9f338e0d885427f9de0d8488642efe9665", 578),
    "rec_test": ("0f15a8d96573cbdb9681c9e558dbb9fb5f754706f1309067b31a93749205da23",
                 "2bfde4f53b614740e97e747d5718b85c4d572b36225ac648dcceabc6f7658413", 546),
    "32by64": ("e3bac23588ac2d21bdc2e609b9f474748afcd466e425cf9f16bb6cf9c5fa8347",
               "a0b943d6f35af4c3fc5af52ce0477cb9afeb27ff9e219de0af7692bba1aff0c7", 707),
    "64by64": ("a179b372e0c17a7206a1c7c85b003b4009665499b221cf78d8cc5a7e8c099a63",
               "d9b10a9dd0ea6d6b50fecab2a0202feca0d70254c0437292ef971df14233cb80", 771),
    "96by64": ("c51689970bf249e62e66217cf2f2db7a1226b9998d69455c1bd6d034e1266bfb",
               "323dc1326a64ccb268316c3272a699247d597fa721612252b91c03c1bbadf47a", 803),
    "128by64": ("c6f5f7cfaaa839c72fc9b7953c261019bf15f015b7de0e35c16a3393493c50f1",
                "97ed392017a230f3b1278a095764a7859559be22d5f603f41907d1a6658acdbf", 803),
}


def _load_case(name: str):
    d = EXAMPLES_DIR / name
    spec_obj = json.loads((d / "schema.json").read_text())
    wit = json.loads((d / "witness.json").read_text())
    return spec_obj, wit


def _digests(spec_obj, wit):
    spec = schema_mod.parse_spec(spec_obj)
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    setup = schema_mod.build_setup(spec, points)
    values = _resolve_values(spec, schema_mod.parse_witness(wit))
    proof = rpm.prove(setup, values, spec.random_seed.encode(), ENGINE)
    coms_bytes, proof_bytes = rpm.encode_proof(setup, proof)
    return (
        hashlib.sha256(proof_bytes).hexdigest(),
        hashlib.sha256(coms_bytes).hexdigest(),
        len(proof_bytes),
    )


def test_golden_covers_every_shipped_example():
    assert sorted(GOLDEN) == sorted(p.name for p in EXAMPLES_DIR.iterdir() if p.is_dir())


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_proof_bytes(name):
    assert _digests(*_load_case(name)) == GOLDEN[name], name


@pytest.mark.skipif(not REFERENCE_EXAMPLES.is_dir(), reason="reference tree absent")
def test_examples_match_reference():
    """Shipped fixtures are byte-identical to the reference's examples/."""
    for ref in sorted(REFERENCE_EXAMPLES.rglob("*.json")):
        ours = EXAMPLES_DIR / ref.relative_to(REFERENCE_EXAMPLES)
        assert ours.is_file(), f"missing fixture {ours}"
        assert filecmp.cmp(ref, ours, shallow=False), f"fixture drift: {ours}"
