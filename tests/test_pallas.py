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


@pytest.mark.slow
def test_fused_msm_pipeline_matches_host():
    """table_flat -> select_reduce -> reduce chain -> tail_horner
    (interpret mode) vs an exact host-integer evaluation.  Slow-marked:
    interpret-mode emulation of the full pipeline is minutes on CPU; the
    compiled kernels are exercised on every TPU bench/CLI run and their
    correctness is asserted against host ints there too."""
    import numpy as np
    import jax.numpy as jnp

    from bulletproofspp_tpu.ops import limb, pallas_field

    ROWS, L = 7, 2048
    nrng = np.random.default_rng(11)
    absd = jnp.asarray(nrng.integers(0, 9, size=(ROWS, L), dtype=np.uint32))
    sgn = jnp.asarray(nrng.integers(0, 2, size=(ROWS, L), dtype=np.uint32))
    base = [ec.scalar_mul(rng.randrange(1, R), ec.G) for _ in range(5)] + [None]
    lanes = [base[i % 6] for i in range(L)]
    px, py, pz = curve.from_affine_host(lanes)

    fx, fy2, fz = pallas_field.table_flat_pallas(px, py, pz, interpret=True)
    flat = pallas_field.select_reduce_pallas(fx, fy2, fz, absd, sgn, interpret=True)
    # the single-kernel scratch-table variant must agree exactly
    flat2 = pallas_field.select_reduce_fused_pallas(px, py, pz, absd, sgn, interpret=True)
    import numpy as _np
    for a, b in zip(flat, flat2):
        assert _np.array_equal(_np.asarray(a), _np.asarray(b))
    W = L // 8
    while W > 128:
        f = min(8, W // 128)
        flat = pallas_field.reduce_block_pallas(flat, factor=f, interpret=True)
        W //= f
    got = curve.to_affine_host(pallas_field.tail_horner_pallas(flat, ROWS, interpret=True))[0]

    want = None
    for r in range(ROWS):
        for _ in range(4):
            want = ec.dbl(want)
        for j in range(L):
            d, s = int(absd[r, j]), int(sgn[r, j])
            if d and lanes[j] is not None:
                p = ec.scalar_mul(d, lanes[j])
                if s:
                    p = (p[0], (-p[1]) % ec.P)
                want = ec.add(want, p)
    assert got == want
