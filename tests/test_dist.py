"""Single-process coverage for the multi-host runtime helpers
(ops/dist.py); the cross-process path runs in tests/test_multihost.py
(-m slow) and __graft_entry__.dryrun_multiprocess."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from jax.sharding import PartitionSpec as P

from bulletproofspp_tpu.ops import dist


def test_initialize_noop_without_env(monkeypatch):
    monkeypatch.delenv("BPPP_COORDINATOR", raising=False)
    assert dist.initialize_from_env() is False
    assert dist.is_multiprocess() is False


def test_global_mesh_shape():
    mesh = dist.global_mesh(win=2)
    assert mesh.shape["win"] == 2
    assert mesh.shape["pts"] == len(jax.devices()) // 2


def test_place_and_fetch_replicated():
    mesh = dist.global_mesh(win=1)
    arr = np.arange(4 * 16, dtype=np.uint32).reshape(4, 16)
    g = dist.place_replicated_host_data(mesh, P(), arr)  # fully replicated
    assert np.array_equal(dist.fetch_replicated(g), arr)
    gs = dist.place_replicated_host_data(mesh, P(None, "pts"), arr)
    assert gs.shape == arr.shape
    assert np.array_equal(np.asarray(gs), arr)


@pytest.mark.slow
def test_sharded_msm_global_single_process():
    """The single-process branch of sharded_msm_global must agree with
    host integers (the multi-process branch is covered by the worker)."""
    from bulletproofspp_tpu.core import ec
    from bulletproofspp_tpu.ops import curve, sharded
    from bulletproofspp_tpu.ops.engine import _msm_lanes

    rng = np.random.default_rng(3)
    scalars = [int(s) for s in rng.integers(1, 2**62, size=32)]
    pairs = [(s, ec.G) for s in scalars]
    absd, sgn, lanes_pts = _msm_lanes(pairs)
    px, py, pz = (np.asarray(t) for t in curve.from_affine_host(lanes_pts))
    import jax.numpy as jnp

    absd_j, sgn_j = sharded.pad_rows(jnp.asarray(absd), jnp.asarray(sgn), 2)
    mesh = dist.global_mesh(win=2)
    out = dist.sharded_msm_global(mesh, px, py, pz, np.asarray(absd_j), np.asarray(sgn_j))
    aff = curve.to_affine_host(tuple(np.asarray(c).reshape(16, 1) for c in out))[0]
    assert aff == ec.scalar_mul(sum(scalars) % ec.R, ec.G)
