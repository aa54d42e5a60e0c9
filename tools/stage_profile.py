"""Per-stage on-chip profile of the MSM pipeline (round-4 MFU work).

Measures each launch of the flat-table MSM path (ops/msm.py msm_kernel,
L >= 1024 branch) in isolation with adjacent null-dispatch RTT
subtraction, median of N, so the pipeline-vs-kernel gap (VERDICT r3
weak #1) can be attributed to a stage instead of guessed.

Usage:  python tools/stage_profile.py [n_points] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

os.environ.setdefault("BPPP_ENGINE", "jax")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulletproofspp_tpu.core import ec
from bulletproofspp_tpu.core.fields import R
from bulletproofspp_tpu.ops import curve, glv, limb, pallas_field as pf
from bulletproofspp_tpu.ops.engine import _interleave_endo
from bulletproofspp_tpu.ops.msm import run_msm, _SCRATCH_TABLE_MIN_L
from bulletproofspp_tpu import native
import random


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


_null_fn = jax.jit(lambda x: x + 1)
_null_arg = jnp.zeros((1,), jnp.uint32)
sync(_null_fn(_null_arg))


def null_time():
    t0 = time.perf_counter()
    sync(_null_fn(_null_arg))
    return time.perf_counter() - t0


def timed(label, fn, reps, per_lane=None, total=None):
    fn()  # warm
    nets = []
    for _ in range(reps):
        tn = null_time()
        t0 = time.perf_counter()
        fn()
        nets.append(time.perf_counter() - t0 - tn)
    med = statistics.median(nets)
    extra = ""
    if per_lane:
        extra = f"  {med / per_lane * 1e9:7.2f} ns/lane"
    if total is not None:
        extra += f"  {med / total * 100:5.1f}% of whole"
    print(f"{label:42s} {med * 1e3:9.3f} ms{extra}")
    return med


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    L = 2 * n_points
    rng = random.Random(7)

    pts, p = [], ec.G
    for _ in range(n_points):
        pts.append(p)
        p = ec.dbl(p)
    x, y, z = curve.from_affine_host(pts)
    px, py, pz = _interleave_endo(x, y, z)
    svals = [rng.randrange(R) for _ in range(n_points)]
    nat = native.glv_recode_batch(svals)
    absd, sgn = jnp.asarray(nat[0]), jnp.asarray(nat[1])
    jax.block_until_ready((px, py, pz, absd, sgn))
    rows = absd.shape[0]

    whole = timed("run_msm (whole pipeline)", lambda: sync(run_msm(px, py, pz, absd, sgn)), reps, per_lane=L)

    # stage 1: flat table build
    tf = jax.jit(pf.table_flat_pallas)
    timed("table_flat_pallas", lambda: sync(tf(px, py, pz)), reps, per_lane=L, total=whole)
    fx, fy2, fz = tf(px, py, pz)
    jax.block_until_ready((fx, fy2, fz))

    # stage 2: select + 8:1 reduce
    sr = jax.jit(pf.select_reduce_pallas)
    timed("select_reduce_pallas (33 rows)", lambda: sync(sr(fx, fy2, fz, absd, sgn)), reps, per_lane=L, total=whole)
    flat = sr(fx, fy2, fz, absd, sgn)
    jax.block_until_ready(flat)

    # fused scratch-table variant for comparison (the >=2M-lane path)
    srf = jax.jit(pf.select_reduce_fused_pallas)
    timed("select_reduce_FUSED (table in VMEM)", lambda: sync(srf(px, py, pz, absd, sgn)), reps, per_lane=L, total=whole)

    # stage 3/4: 8:1 reduce chain
    levels = []
    W = L // 8
    cur = flat
    while W > 128:
        f = min(8, W // 128)
        rb = jax.jit(lambda p, f=f: pf.reduce_block_pallas(p, factor=f))
        timed(f"reduce_block factor={f} (W={W})", lambda rb=rb, cur=cur: sync(rb(cur)), reps, per_lane=L, total=whole)
        cur = rb(cur)
        jax.block_until_ready(cur)
        W //= f

    # stage 5: tail + Horner
    th = jax.jit(lambda p: pf.tail_horner_pallas(p, rows))
    timed("tail_horner_pallas", lambda: sync(th(cur)), reps, per_lane=L, total=whole)

    # kernel reference rate: chained padd at full width
    P = tuple(jnp.tile(t[:, :1], (1, L)) for t in (px, py, pz))
    REP = 8

    def chain():
        @jax.jit
        def f(p):
            for _ in range(REP):
                p = pf.padd_pallas(p, p, block=512)
            return p

        return f

    cf = chain()
    t = timed(f"padd chain x{REP} (block=512)", lambda: sync(cf(P)), reps)
    tp = t / REP / L
    print(f"{'-> padd kernel':42s} {tp * 1e9:9.2f} ns/lane")
    print(f"{'-> pipeline model 40 padds/lane':42s} {40 * L * tp * 1e3:9.3f} ms  util={40 * L * tp / whole:.3f}")


if __name__ == "__main__":
    main()
