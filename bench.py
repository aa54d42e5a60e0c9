"""Benchmark driver: vectorized MSM throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no timing numbers (BASELINE.md: "published: {}");
its analytic cost model is ~100 effective point-adds per MSM point for the
129-row GLV Straus loop (SURVEY §6).  As the executable baseline we measure
the exact host-integer engine (core.engine.HostEngine — the reference's
algorithm, reference: src/Commitment.hs:311-353) on a small instance and
scale per-point; ``vs_baseline`` is the speedup of the TPU engine over
that per-point host rate on the headline MSM size.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("BPPP_ENGINE", "jax")


def main():
    import random

    import jax
    import jax.numpy as jnp

    from bulletproofspp_tpu.core import ec
    from bulletproofspp_tpu.core.fields import R
    from bulletproofspp_tpu.ops import glv, limb
    from bulletproofspp_tpu.ops.msm import run_msm

    rng = random.Random(2024)
    n_points = int(os.environ.get("BENCH_MSM_POINTS", "2048"))

    # deterministic points: G, 2G, 4G, ...
    pts, p = [], ec.G
    for _ in range(n_points):
        pts.append(p)
        p = ec.dbl(p)
    scalars = [rng.randrange(R) for _ in range(n_points)]

    # --- host baseline (reference algorithm, exact integers) ---------------
    base_n = min(64, n_points)
    t0 = time.perf_counter()
    ec.msm_host(scalars[:base_n], pts[:base_n])
    host_s_per_point = (time.perf_counter() - t0) / base_n

    # --- device path --------------------------------------------------------
    halves, lane_pts = [], []
    for s, pt in zip(scalars, pts):
        k1, k2 = glv.split(s)
        halves += [k1, k2]
        lane_pts += [pt, (ec.BETA * pt[0] % ec.P, pt[1])]
    absd, sgn = glv.recode_batch(halves)
    px = jnp.asarray(limb.pack_ints([q[0] for q in lane_pts]))
    py = jnp.asarray(limb.pack_ints([q[1] for q in lane_pts]))
    absd, sgn = jnp.asarray(absd), jnp.asarray(sgn)

    # compile + warmup
    jax.block_until_ready(run_msm(px, py, absd, sgn))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run_msm(px, py, absd, sgn)
    jax.block_until_ready(out)
    dev_s = (time.perf_counter() - t0) / iters

    points_per_s = n_points / dev_s
    host_points_per_s = 1.0 / host_s_per_point
    print(
        json.dumps(
            {
                "metric": f"msm_{n_points}pt_throughput",
                "value": round(points_per_s, 1),
                "unit": "points/s",
                "vs_baseline": round(points_per_s / host_points_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
