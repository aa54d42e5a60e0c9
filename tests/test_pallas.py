"""Pallas fused point-add kernel vs the XLA path (interpret mode on CPU;
the compiled kernel runs on real TPU via bench/BPPP_PALLAS)."""

import random

import pytest

jax = pytest.importorskip("jax")

from bulletproofspp_tpu.core import ec
from bulletproofspp_tpu.core.fields import R
from bulletproofspp_tpu.ops import curve
from bulletproofspp_tpu.ops.pallas_field import padd_pallas

rng = random.Random(17)


def test_pallas_padd_matches_host():
    n = 8
    pts_a = [ec.scalar_mul(rng.randrange(1, R), ec.G) for _ in range(n - 2)] + [None, ec.G]
    pts_b = [ec.scalar_mul(rng.randrange(1, R), ec.G) for _ in range(n - 2)] + [ec.G, ec.G]
    pa = curve.from_affine_host(pts_a)
    pb = curve.from_affine_host(pts_b)
    got = curve.to_affine_host(padd_pallas(pa, pb, block=8, interpret=True))
    want = [ec.add(a, b) for a, b in zip(pts_a, pts_b)]
    assert got == want
