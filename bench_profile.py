"""Microbenchmark breakdown of the MSM pipeline on the real TPU.

Times each stage (table build, one-hot select, lane tree-reduce, Horner)
plus primitive costs (padd, limb.mul, u32 elementwise mul/add peak) to
locate the wall-clock and establish an EMPIRICAL VPU speed-of-light
anchor for the roofline in bench.py.

Methodology: tunneled backend, so every timing forces host
materialization (np.asarray of a tiny slice) per iteration; report the
min over iters minus the measured null round-trip.
"""

import os
import time

import numpy as np

os.environ.setdefault("BPPP_ENGINE", "jax")

import jax
import jax.numpy as jnp

from bulletproofspp_tpu.ops import limb, curve, msm, glv
from bulletproofspp_tpu.core import ec

L = int(os.environ.get("PROF_L", "65536"))
ITERS = int(os.environ.get("PROF_ITERS", "5"))


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(name, fn, *args):
    fn(*args)  # compile
    sync(fn(*args))
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:34s} {best * 1e3:9.3f} ms")
    return best


def main():
    print(f"backend={jax.default_backend()} device={jax.devices()[0]} L={L}")
    rng = np.random.default_rng(0)

    # null round-trip
    z = jnp.zeros((1,), jnp.uint32)
    t_null = timeit("null (tunnel RTT)", lambda a: a + 1, z)

    # limb-plane operands
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(16, L), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(16, L), dtype=np.uint32))

    # raw u32 elementwise peak: fused multiply+add chain, 64 ops deep
    @jax.jit
    def u32_chain(x, y):
        acc = x
        for _ in range(32):
            acc = acc * y + x
        return acc

    t = timeit("u32 mul+add chain (64 ops/elem)", u32_chain, a, b)
    ops = 64 * 16 * L
    print(f"  -> {ops / max(t - t_null, 1e-9) / 1e9:8.1f} Gop/s u32 (mul+add mix)")

    @jax.jit
    def u32_addchain(x, y):
        acc = x
        for _ in range(64):
            acc = acc + y
        return acc

    t = timeit("u32 add chain (64 ops/elem)", u32_addchain, a, b)
    print(f"  -> {64 * 16 * L / max(t - t_null, 1e-9) / 1e9:8.1f} Gop/s u32 add")

    # field mul / add / carry
    t_mul = timeit("limb.mul (16x16 schoolbook)", limb.mul, a, b)
    timeit("limb.add", limb.add, a, b)
    timeit("limb._carry", jax.jit(limb._carry), a)

    # point ops at L lanes
    px, py, pz = curve.from_affine_host([ec.G] * 4)
    P = tuple(jnp.tile(t, (1, L // 4)) for t in (px, py, pz))
    t_padd = timeit("curve.padd (12 muls)", curve.padd, P, P)
    timeit("curve.pdbl", curve.pdbl, P)

    # msm stage breakdown at ROWS x L
    scalars = [int(s) for s in rng.integers(1, 1 << 62, size=L // 2)]
    from bulletproofspp_tpu.ops.engine import _msm_lanes

    pairs = [(s, ec.G) for s in scalars]
    absd_np, sgn_np, lanes_pts = _msm_lanes(pairs)
    absd = jnp.asarray(absd_np)
    sgn = jnp.asarray(sgn_np)
    assert absd.shape == (glv.ROWS, L), absd.shape
    px, py, pz = curve.from_affine_host(lanes_pts)

    t_table = timeit("stage: _table (7 padds)", jax.jit(msm._table), px, py, pz)

    tx, ty2, tz = jax.jit(msm._table)(px, py, pz)

    @jax.jit
    def stage_select(tx, ty2, tz, absd, sgn):
        L_ = absd.shape[1]
        rows = absd.shape[0]

        def onehot_select(table, idx):
            n_entries = table.shape[1]
            acc = jnp.zeros((limb.NLIMB, rows, L_), jnp.uint32)
            for k in range(n_entries):
                mask = (idx == k)[None]
                acc = acc + jnp.where(mask, table[:, k, None, :], jnp.uint32(0))
            return acc

        idxy = absd + 9 * sgn
        return onehot_select(tx, absd), onehot_select(ty2, idxy), onehot_select(tz, absd)

    t_sel = timeit("stage: one-hot select", stage_select, tx, ty2, tz, absd, sgn)
    selx, sely, selz = stage_select(tx, ty2, tz, absd, sgn)

    @jax.jit
    def stage_reduce(sx, sy, sz):
        return msm._reduce_lanes((sx, sy, sz), L)

    t_red = timeit("stage: lane tree-reduce", stage_reduce, selx, sely, selz)

    sel = stage_reduce(selx, sely, selz)

    @jax.jit
    def stage_horner(s):
        from bulletproofspp_tpu.ops import pallas_field

        rx, ry, rz = (t[..., 0] for t in s)
        return pallas_field.horner_pallas(rx, ry, rz)

    try:
        t_h = timeit("stage: Horner (pallas)", stage_horner, sel)
    except Exception as e:
        print("horner pallas failed:", e)
        t_h = 0

    t_full = timeit("FULL msm_kernel", msm.run_msm, px, py, pz, absd, sgn)

    print("\n--- breakdown ---")
    for n, t in [("table", t_table), ("select", t_sel), ("reduce", t_red), ("horner", t_h)]:
        print(f"{n:8s} {(t - t_null) * 1e3:8.2f} ms  {(t - t_null) / max(t_full - t_null, 1e-9) * 100:5.1f}%")
    print(f"full     {(t_full - t_null) * 1e3:8.2f} ms")
    print(f"padd at L lanes: {(t_padd - t_null) * 1e3:.3f} ms; "
          f"mul: {(t_mul - t_null) * 1e3:.3f} ms; "
          f"padds in pipeline ~= {7 + 33}, tree adds 33*(L-1)")


if __name__ == "__main__":
    main()
