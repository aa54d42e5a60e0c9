"""Multi-chip sharding tests on the 8-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8): sharded MSM must be bit-equal
to the single-device kernel, per SURVEY §4 ("multi-chip MSM tests that
compare sharded vs single-device results")."""

import random

import pytest

jax = pytest.importorskip("jax")

from bulletproofspp_tpu.core import ec
from bulletproofspp_tpu.core.fields import R

rng = random.Random(5)


def _msm_inputs(n):
    import jax.numpy as jnp

    from bulletproofspp_tpu.ops import glv, limb

    pts, p = [], ec.G
    for _ in range(n):
        pts.append(p)
        p = ec.dbl(p)
    scalars = [rng.randrange(R) for _ in range(n)]
    halves, lane_pts = [], []
    for s, pt in zip(scalars, pts):
        k1, k2 = glv.split(s)
        halves += [k1, k2]
        lane_pts += [pt, (ec.BETA * pt[0] % ec.P, pt[1])]
    absd, sgn = glv.recode_batch(halves)
    from bulletproofspp_tpu.ops import curve

    px, py, pz = curve.from_affine_host(lane_pts)
    want = ec.msm_host(scalars, pts)
    return (px, py, pz, jnp.asarray(absd), jnp.asarray(sgn)), want


@pytest.mark.slow
def test_sharded_msm_matches_single_device():
    from bulletproofspp_tpu.ops import curve, sharded

    assert len(jax.devices()) >= 8
    mesh = sharded.make_mesh(jax.devices()[:8], win=2)  # 2 x 4
    (px, py, pz, absd, sgn), want = _msm_inputs(16)  # 32 lanes = 8 per pts-shard
    absd, sgn = sharded.pad_rows(absd, sgn, 2)
    got = sharded.sharded_msm_jit(mesh)(px, py, pz, absd, sgn)
    assert curve.to_affine_host(got) == [want]


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)
