"""Completeness fix for inline ranges with fewer digits than symbols
(round 3): the reference sizes the norm basis as one term per digit
(reference: TypedReciprocal.hs:344) while its inline phase-1 rows pad to
max(digits, base-1 [+bit]) (reference: TypedReciprocal.hs:150-152) — for
digits < base-1 the symbol-multiplicity rows overrun the basis and the
reciprocal conservation silently breaks (proofs never verify; every
reference example happens to satisfy digits >= base-1).  _nrm_rows sizes
the basis to the committed row count, completing that schema class while
remaining identical wherever the reference works (goldens unchanged,
tests/test_golden.py)."""

import pytest

from bulletproofspp_tpu.cli import _resolve_values
from bulletproofspp_tpu.core import range_proof as rpm
from bulletproofspp_tpu.core.engine import HostEngine
from bulletproofspp_tpu.core.transcript import take_points
from bulletproofspp_tpu.core.typed_reciprocal import _nrm_rows
from bulletproofspp_tpu.io_ import schema as schema_mod

ENGINE = HostEngine()


def _roundtrip(spec_obj, wit):
    spec = schema_mod.parse_spec(spec_obj)
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    setup = schema_mod.build_setup(spec, points)
    vals = _resolve_values(spec, schema_mod.parse_witness(wit))
    pr = rpm.prove(setup, vals, b"s", ENGINE)
    assert rpm.verify(setup, pr, ENGINE)
    cb, pb = rpm.encode_proof(setup, pr)
    rt = rpm.decode_proof(setup, cb, pb, ENGINE)
    assert rt is not None and rpm.verify(setup, rt, ENGINE)
    return setup


@pytest.mark.parametrize(
    "base,mx,amt",
    [
        (16, 16**2, 3),        # 2 digits, 15 symbols: the smallest repro
        (16, 2**16, 65535),    # boundary amount
        (16, 2**31, 1000),     # has_bit variant
        (16, 2**32, 0),        # exact power, zero amount
        (9, 81, 3),            # base 9 below 8 digits
        (10, 12345, 11111),    # inexact width
        (16, 257, 256),        # has_bit tiny width
    ],
)
def test_small_width_roundtrip(base, mx, amt):
    _roundtrip(
        {
            "basisSeed": "sw",
            "argument": "NL",
            "ranges": [{"base": base, "min": 0, "max": mx, "isOutput": True}],
        },
        [{"amount": amt}],
    )


def test_small_width_ip_argument():
    _roundtrip(
        {
            "basisSeed": "sw",
            "argument": "IP",
            "ranges": [{"base": 16, "min": 0, "max": 2**16, "isOutput": True}],
        },
        [{"amount": 12345}],
    )


def test_small_width_mixed_with_shared():
    """A small-width inline range combined with a conserved pair (shared
    rows keep one row per digit; only inline rows widen)."""
    _roundtrip(
        {
            "basisSeed": "sw",
            "argument": "NL",
            "ranges": [
                {"base": 16, "min": 0, "max": 2**16, "isOutput": True},
                {"base": 16, "min": 0, "max": 2**16, "isOutput": False},
            ],
        },
        [{"amount": 777}, {"amount": 777}],
    )


def test_nrm_rows_matches_reference_on_supported_schemas():
    """Wherever digits >= symbols (every reference example), _nrm_rows
    equals the reference's len(base_coeffs) — proof bytes unchanged."""
    from bulletproofspp_tpu.core.typed_reciprocal import make_range_data
    from bulletproofspp_tpu.core.fields import Q

    for base, mx in [(16, 2**64), (9, 2**32), (2, 2**16), (16, 2**60)]:
        rd = make_range_data(Q, base, 0, mx, False, True, False)
        assert _nrm_rows(rd) == len(rd.base_coeffs)


# ---------------------------------------------------------------------------
# D2 (docs/UPSTREAM_SEMANTICS.md): binary digits at the power-of-two
# midpoint.  Upstream's strict `nAdj > bn` (reference: Binary.hs:63)
# leaves n_adj == bn == 2^n1 with an (n1+1)-bit remainder; padLeft never
# truncates (Utils.hs:77), so the digit vector gains a row and honest
# proofs never verify.  make_digits_binary takes the top digit whenever
# the remainder would overflow n1 bits — differing ONLY in that case.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mx", [2**8, 2**16, 2**32])
def test_binary_midpoint_roundtrip(mx):
    _roundtrip(
        {
            "binary": True,
            "basisSeed": "bin mid",
            "ranges": [{"max": mx}, {"max": mx}],
        },
        [{"amount": mx // 2}, {"amount": 5}],
    )


def test_binary_digits_always_sized_to_basis():
    """Every in-range value decomposes to exactly len(base_coeffs) digits
    that weight-sum back to the value; at n_adj == bn < 2^n1 the top
    digit stays 0 (byte parity with upstream where upstream works)."""
    from bulletproofspp_tpu.core.binary_rp import (
        make_range_data_binary,
        make_digits_binary,
    )

    for mx in [3, 5, 256, 257, 1000, 2**16, 2**16 + 1]:
        rd = make_range_data_binary(1 << 256, 0, mx, False, False)
        for v in range(mx) if mx <= 1000 else [0, 1, mx // 2, mx - 1, rd.base_coeffs[0]]:
            d = make_digits_binary(rd, v)
            assert len(d) == len(rd.base_coeffs), (mx, v)
            assert all(x in (0, 1) for x in d)
            assert sum(c * x for c, x in zip(rd.base_coeffs, d)) == v, (mx, v)
    # upstream-parity case: bn < 2^n1, value == bn keeps dn == 0
    rd = make_range_data_binary(1 << 256, 0, 3, False, False)  # bn=1, bs=[1]
    assert make_digits_binary(rd, 1) == [0, 1]


def test_parse_spec_small_range_with_base():
    """dict.get's eager default used to raise ZeroDivisionError on tiny
    widths even with an explicit base."""
    spec = schema_mod.parse_spec(
        {"basisSeed": "x", "ranges": [{"base": 16, "min": 0, "max": 3, "isOutput": True}]}
    )
    assert spec.ranges[0].base == 16
