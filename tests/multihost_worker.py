"""Worker for the 2-process multi-host tests: joins a jax.distributed
CPU cluster (4 virtual devices per process -> one 8-device global mesh)
and runs the sharded MSM — or the PROTOCOL-level batch verification
(VERDICT r2 item 3) — across the process boundary.

Invoked as:  python multihost_worker.py <coord_host:port> <nprocs> <pid> \
                 [msm | batch <corpus.pkl>]
Prints 'RESULT <x> <y>' (msm mode) or 'BATCH accept=<b> reject=<b>'
(batch mode) on success.
"""

import os
import sys


def main():
    coord, nprocs, pid = sys.argv[1], sys.argv[2], sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "msm"
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

    if mode == "batch":
        return batch_mode(sys.argv[5])

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


def batch_mode(corpus_path: str):
    """Protocol-level multi-process run (VERDICT r2 item 3): decode +
    batch-verify a corpus of encoded proofs with a ShardedJaxEngine over
    the GLOBAL 2-process mesh (the merged RLC zero-check MSM crosses the
    process boundary via ops.dist placement), then re-run with one
    tampered proof and require rejection.  Every process holds identical
    inputs (the replicated Fiat-Shamir invariant) and must compute the
    identical accept/reject pair — the dealer-aggregation semantics the
    reference stubs out (reference: src/ZKP.hs:124-131)."""
    import pickle

    import jax

    from bulletproofspp_tpu.core.batch import batch_verify_encoded
    from bulletproofspp_tpu.core.transcript import take_points
    from bulletproofspp_tpu.io_ import schema as schema_mod
    from bulletproofspp_tpu.ops import dist
    from bulletproofspp_tpu.ops.engine import ShardedJaxEngine

    with open(corpus_path, "rb") as f:
        corpus = pickle.load(f)
    spec = schema_mod.parse_spec(corpus["spec"])
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    setup = schema_mod.build_setup(spec, points)
    blobs = corpus["blobs"]
    assert len(blobs) >= 64, len(blobs)

    mesh = dist.global_mesh(win=2)  # 2 x 4 over 2 processes
    # shard_above=64 forces the merged MSM through the sharded
    # multi-process path (same-schema merging keeps it a few hundred pairs)
    engine = ShardedJaxEngine(mesh=mesh, host_below=0, shard_above=64)
    assert engine._multiproc and jax.process_count() == 2

    entries = [(setup, coms_b, proof_b) for coms_b, proof_b in blobs]
    accept = batch_verify_encoded(entries, engine)

    # tamper ONE proof: flip a low bit of its first witness scalar — the
    # bytes still parse (scalars have no validity structure), so the
    # rejection must come from the merged zero-check itself
    coms_b, proof_b = blobs[len(blobs) // 2]
    bad = bytes([proof_b[0] ^ 1]) + proof_b[1:]
    tampered = list(entries)
    tampered[len(blobs) // 2] = (setup, coms_b, bad)
    reject = batch_verify_encoded(tampered, engine)

    assert accept is True and reject is False, (accept, reject)
    print(f"BATCH accept={accept} reject={reject}", flush=True)


if __name__ == "__main__":
    main()
