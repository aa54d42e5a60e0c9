"""The vmapped large-L Pallas MSM path, pinned off-device.

Production routes msm_groups/msm_many through ``jax.vmap(msm_kernel)``
(ops/msm.py: _msm_pair_compiled); at L >= 1024 that traces the Pallas
grid + VMEM kernels UNDER vmap — a combination previously validated only
on real TPU runs.  This exercises the exact production dispatch in
interpret mode (pltpu.force_tpu_interpret_mode) against host integers.

Slow-marked: interpret emulation of the 5-kernel pipeline x 2 batch
members is ~minutes on CPU.
"""

import random

import pytest

jax = pytest.importorskip("jax")
import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from bulletproofspp_tpu.core import ec
from bulletproofspp_tpu.core.fields import R
from bulletproofspp_tpu.ops import curve, msm

rng = random.Random(23)


@pytest.mark.slow
def test_vmapped_pallas_msm_matches_host(monkeypatch):
    import bulletproofspp_tpu.ops.curve as curve_mod

    monkeypatch.setattr(curve_mod, "_PALLAS_ENABLED", True)

    B, L = 2, 1024
    nrng = np.random.default_rng(29)
    rows = 33
    absd = jnp.asarray(nrng.integers(0, 9, size=(B, rows, L), dtype=np.uint32))
    sgn = jnp.asarray(nrng.integers(0, 2, size=(B, rows, L), dtype=np.uint32))
    base = [ec.scalar_mul(rng.randrange(1, R), ec.G) for _ in range(7)] + [None]
    lanes = [base[i % 8] for i in range(L)]
    px, py, pz = curve.from_affine_host(lanes)
    bpx, bpy, bpz = (jnp.stack([t, t]) for t in (px, py, pz))

    with pltpu.force_tpu_interpret_mode():
        outs = msm._msm_pair_compiled(bpx, bpy, bpz, absd, sgn)
    got = [curve.to_affine_host(tuple(t[i] for t in outs))[0] for i in range(B)]

    for i in range(B):
        want = None
        for r in range(rows):
            for _ in range(4):
                want = ec.dbl(want)
            for j in range(L):
                d, s = int(absd[i, r, j]), int(sgn[i, r, j])
                if d and lanes[j] is not None:
                    p = ec.scalar_mul(d, lanes[j])
                    if s:
                        p = (p[0], (-p[1]) % ec.P)
                    want = ec.add(want, p)
        assert got[i] == want, f"batch member {i}"
