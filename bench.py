"""Benchmark driver (real chip): MSM throughput + optional proof benches.

Prints ONE JSON line on stdout:
  {"metric", "value", "unit", "vs_baseline"}

The reference publishes no timing numbers (BASELINE.md "published: {}");
as the executable baseline we measure the exact host-integer engine
(core.engine.HostEngine — the reference's Straus/GLV algorithm,
reference: src/Commitment.hs:311-353) on a small instance and scale
per-point; ``vs_baseline`` is the TPU-vs-host per-point speedup.

Timing is honest: distinct pre-staged inputs per iteration and a
block_until_ready on every output (dispatch pipelining cannot hide work).

BENCH_FULL=1 additionally reports prove/verify/batch-verify rates for the
64-bit range-proof config on stderr.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

os.environ.setdefault("BPPP_ENGINE", "jax")


def bench_msm(n_points: int, iters: int):
    """Production-shaped measurement: the basis is fixed (packed once and
    cached, as the engine does for every setup), per-iteration work is
    fresh scalars -> native GLV digit recode -> device MSM."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bulletproofspp_tpu.core import ec
    from bulletproofspp_tpu.core.fields import R
    from bulletproofspp_tpu.ops import curve, glv
    from bulletproofspp_tpu.ops.engine import _interleave_endo
    from bulletproofspp_tpu.ops.msm import run_msm
    from bulletproofspp_tpu import native

    rng = random.Random(2024)
    pts, p = [], ec.G
    for _ in range(n_points):
        pts.append(p)
        p = ec.dbl(p)

    # host baseline (reference algorithm, exact integers)
    base_n = min(64, n_points)
    scalars = [rng.randrange(R) for _ in range(n_points)]
    t0 = time.perf_counter()
    ec.msm_host(scalars[:base_n], pts[:base_n])
    host_pps = base_n / (time.perf_counter() - t0)

    # one-time basis packing (cached per setup in the engine)
    x, y, z = curve.from_affine_host(pts)
    px, py, pz = _interleave_endo(x, y, z)  # endomorphism on device
    jax.block_until_ready((px, py, pz))

    def digits(seed):
        r = random.Random(seed)
        svals = [r.randrange(R) for _ in range(n_points)]
        nat = native.glv_recode_batch(svals)
        if nat is None:
            halves = []
            for s in svals:
                k1, k2 = glv.split(s)
                halves += [k1, k2]
            nat = glv.recode_batch(halves)
        return jnp.asarray(nat[0]), jnp.asarray(nat[1])

    argsets = [digits(i) for i in range(iters)]
    jax.block_until_ready(argsets)
    _ = np.asarray(run_msm(px, py, pz, *argsets[0])[0])  # compile + warm
    # HONEST timing: materialize every output on host (block_until_ready
    # alone does not wait for remote execution on the tunneled backend)
    t0 = time.perf_counter()
    for a in argsets:
        _ = np.asarray(run_msm(px, py, pz, *a)[0])
    dev_s = (time.perf_counter() - t0) / iters

    # end-to-end including per-iteration host scalar pipeline
    t0 = time.perf_counter()
    for i in range(iters):
        _ = np.asarray(run_msm(px, py, pz, *digits(100 + i))[0])
    e2e_s = (time.perf_counter() - t0) / iters
    print(
        json.dumps(
            {
                "msm_device_ms": round(dev_s * 1e3, 3),
                "msm_e2e_with_host_scalar_prep_ms": round(e2e_s * 1e3, 3),
                "n_points": n_points,
            }
        ),
        file=sys.stderr,
    )
    return n_points / dev_s, host_pps, dev_s


def bench_proofs():
    """prove/verify/batch-verify rates for the 64-bit config (stderr)."""
    from bulletproofspp_tpu.cli import _resolve_values
    from bulletproofspp_tpu.core import range_proof as rpm
    from bulletproofspp_tpu.core.batch import batch_verify
    from bulletproofspp_tpu.core.engine import default_engine
    from bulletproofspp_tpu.core.transcript import take_points
    from bulletproofspp_tpu.io_ import schema as schema_mod

    spec_obj = {
        "basisSeed": "bench points",
        "argument": "NL",
        "ranges": [{"base": 16, "min": 0, "max": 2**64, "isOutput": True}],
    }
    engine = default_engine()
    spec = schema_mod.parse_spec(spec_obj)
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    setup = schema_mod.build_setup(spec, points)

    def mk(i):
        values = _resolve_values(spec, schema_mod.parse_witness([{"amount": 10**9 + i}]))
        return rpm.prove(setup, values, f"bench{i}".encode(), engine)

    mk(0)  # warm all kernel shapes
    n = int(os.environ.get("BENCH_PROOFS", "8"))
    t0 = time.perf_counter()
    proofs = [mk(i) for i in range(n)]
    prove_s = (time.perf_counter() - t0) / n

    rpm.verify(setup, proofs[0], engine)
    t0 = time.perf_counter()
    ok = all(rpm.verify(setup, pr, engine) for pr in proofs)
    verify_s = (time.perf_counter() - t0) / n

    items = [(setup, pr) for pr in proofs]
    batch_verify(items, engine)
    t0 = time.perf_counter()
    okb = batch_verify(items, engine)
    batch_s = (time.perf_counter() - t0) / n

    # pipelined proving: independent proofs from worker threads overlap
    # host transcript work with device dispatch (the production serving
    # shape; device queues serialize the EC work)
    from concurrent.futures import ThreadPoolExecutor

    workers = int(os.environ.get("BENCH_PROVE_THREADS", "4"))
    with ThreadPoolExecutor(workers) as ex:
        list(ex.map(mk, range(2)))  # warm thread paths
        t0 = time.perf_counter()
        piped = list(ex.map(mk, range(2 * n)))
        pipe_s = (time.perf_counter() - t0) / len(piped)
    print(
        json.dumps(
            {
                "proves_per_s": round(1 / prove_s, 3),
                "proves_per_s_pipelined": round(1 / pipe_s, 3),
                "verifies_per_s": round(1 / verify_s, 3),
                "batch_verifies_per_s": round(1 / batch_s, 3),
                "all_valid": bool(ok and okb),
                "n": n,
            }
        ),
        file=sys.stderr,
    )


def main():
    n_points = int(os.environ.get("BENCH_MSM_POINTS", "16384"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    pps, host_pps, dev_s = bench_msm(n_points, iters)
    if os.environ.get("BENCH_FULL"):
        bench_proofs()
    print(
        json.dumps(
            {
                "metric": f"msm_{n_points}pt_throughput",
                "value": round(pps, 1),
                "unit": "points/s",
                "vs_baseline": round(pps / host_pps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
