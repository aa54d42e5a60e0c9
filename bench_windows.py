"""Window-size / Pippenger study for the MSM (VERDICT r1 item 3).

Measures the production w=4 one-hot Straus pipeline at 2k/32k/512k
points, plus the two primitives every variant is built from (fused
complete add; gather vs one-hot select), and prints the padd-count cost
model that ranks the variants.  Results + analysis go to BENCH_NOTES.md.
"""

import os
import time

import numpy as np

os.environ.setdefault("BPPP_ENGINE", "jax")

import jax
import jax.numpy as jnp

from bulletproofspp_tpu.core import ec
from bulletproofspp_tpu.ops import curve, msm
from bulletproofspp_tpu.ops.engine import _msm_lanes


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def best(fn, *a, iters=4):
    fn(*a)
    sync(fn(*a))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    t_null = best(jax.jit(lambda x: x + 1), jnp.zeros((1,), jnp.uint32))
    print(f"null RTT {t_null*1e3:.2f} ms")

    # 2M/4M-lane rows (VERDICT r2 item 9): the HBM-capacity frontier where
    # throughput stops rising — the single-chip envelope multi-chip scaling
    # is judged against.  BENCH_FRONTIER=1 adds them (multi-minute compiles).
    sizes = (2048, 32768, 524288)
    if os.environ.get("BENCH_FRONTIER"):
        sizes = sizes + (1048576, 2097152)
    for n_points in sizes:
        rng = np.random.default_rng(1)
        # synthesize digits directly at scale (recode of 512k scalars on
        # host takes minutes and is not what this study measures)
        L = 2 * n_points
        absd = jnp.asarray(rng.integers(0, 9, size=(33, L), dtype=np.uint32))
        sgn = jnp.asarray(rng.integers(0, 2, size=(33, L), dtype=np.uint32))
        base = curve.from_affine_host([ec.G, ec.dbl(ec.G)])
        px, py, pz = (jnp.tile(t, (1, L // 2)) for t in base)
        t = best(msm.run_msm, px, py, pz, absd, sgn, iters=3)
        net = (t - t_null) * 1e3
        print(
            f"w=4 one-hot Straus  n={n_points:7d}  {t*1e3:9.2f} ms incl RTT  "
            f"{net:9.2f} ms net  {n_points/( (t-t_null) ):,.0f} pts/s  "
            f"{40*L/(t-t_null)/1e6:8.1f} M padds/s"
        )

    # primitive rates for the cost model
    L = 65536
    P = tuple(jnp.tile(t, (1, L)) for t in curve.from_affine_host([ec.G]))
    from bulletproofspp_tpu.ops.pallas_field import padd_pallas

    REP = 64  # deep chain: ~40 ms signal dwarfs the +-1-2 ms RTT jitter (r5)

    @jax.jit
    def chain(p):
        for _ in range(REP):
            p = padd_pallas(p, p, block=512)
        return p

    t_padd = (best(chain, P) - t_null) / REP / L
    print(f"fused padd: {t_padd*1e9:.2f} ns/lane")

    # gather vs one-hot: the selection primitive that rules out bucketed
    # Pippenger on TPU (scatter/gather run on the scalar unit)
    tbl = jnp.tile(P[0], (1, 1))  # (16, L)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, L, size=L, dtype=np.int32))

    @jax.jit
    def gather(tb, ix):
        return jnp.take(tb, ix, axis=1)

    t_g = best(gather, tbl, idx) - t_null
    onehot_t = []

    @jax.jit
    def onehot9(tb, d):
        acc = jnp.zeros_like(tb)
        for k in range(9):
            acc = acc + jnp.where((d == k)[None], tb, jnp.uint32(0))
        return acc

    d9 = jnp.asarray(np.random.default_rng(0).integers(0, 9, size=L, dtype=np.uint32))
    t_o = best(onehot9, tbl, d9) - t_null
    print(f"random gather (16,{L}): {t_g*1e3:.2f} ms; 9-entry one-hot select: {t_o*1e3:.2f} ms")

    print("\ncost model (padds per lane = table + rows; measured rate above):")
    for w, rows, tab in ((3, 43, 3), (4, 33, 7), (5, 26, 15), (6, 22, 31), (8, 17, 127)):
        per_lane = tab + rows
        print(
            f"  w={w}: {tab:3d} table + {rows:2d} rows = {per_lane:3d} padds/lane "
            f"-> {per_lane*2*32768*t_padd*1e3:7.1f} ms (32k pts, kernel-rate model)"
        )


if __name__ == "__main__":
    main()
