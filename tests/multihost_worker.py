"""Worker for the 2-process multi-host test: joins a jax.distributed
CPU cluster (4 virtual devices per process -> one 8-device global mesh)
and runs the sharded MSM across the process boundary.

Invoked as:  python multihost_worker.py <coord_host:port> <nprocs> <pid>
Prints the affine result as 'RESULT <x> <y>' on success.
"""

import os
import sys


def main():
    coord, nprocs, pid = sys.argv[1], sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the SHARED persistent compile cache deadlocks multi-process runs:
    # one process loads a cached executable while the other compiles,
    # skewing/mismatching the Gloo communicator setup until the shutdown
    # barrier times out.  Multi-process workers always compile fresh.
    os.environ["BPPP_NO_COMPILE_CACHE"] = "1"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()
    os.environ["BPPP_COORDINATOR"] = coord
    os.environ["BPPP_NUM_PROCS"] = nprocs
    os.environ["BPPP_PROC_ID"] = pid

    import jax

    jax.config.update("jax_platforms", "cpu")

    from bulletproofspp_tpu.ops import dist

    assert dist.initialize_from_env()
    assert jax.device_count() == 4 * int(nprocs), jax.device_count()
    assert jax.process_count() == int(nprocs)

    import numpy as np

    from bulletproofspp_tpu.core import ec
    from bulletproofspp_tpu.ops import curve, glv, sharded
    from bulletproofspp_tpu.ops.engine import _msm_lanes

    # deterministic inputs: every process derives the identical batch
    # (the host-replicated Fiat-Shamir invariant)
    rng = np.random.default_rng(99)
    n = 64
    scalars = [int(s) for s in rng.integers(1, 2**62, size=n)]
    pairs = [(s, ec.G) for s in scalars]
    import jax.numpy as jnp

    absd, sgn, lanes_pts = _msm_lanes(pairs)
    px, py, pz = (np.asarray(t) for t in curve.from_affine_host(lanes_pts))
    absd, sgn = sharded.pad_rows(jnp.asarray(absd), jnp.asarray(sgn), 2)
    absd, sgn = np.asarray(absd), np.asarray(sgn)

    mesh = dist.global_mesh(win=2)  # 2 x 4: window axis within, pts across
    out = dist.sharded_msm_global(mesh, px, py, pz, absd, sgn)
    aff = curve.to_affine_host(tuple(np.asarray(c).reshape(16, 1) for c in out))[0]

    want = ec.scalar_mul(sum(scalars) % ec.R, ec.G)
    assert aff == want, (aff, want)
    print(f"RESULT {aff[0]} {aff[1]}", flush=True)


if __name__ == "__main__":
    main()
