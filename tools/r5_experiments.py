"""Round-5 MFU experiments: attribute the ~30% pipeline-vs-kernel gap.

Hypotheses measured on-chip, each with adjacent-null RTT subtraction:
  H1 padd rate depends on block width (narrow halving adds are slow)
  H2 fixed per-program cost dominates short programs (grid 2112 copy)
  H3 the one-hot select is more expensive than its op count suggests
  H4 wider lane blocks (2048) amortize program overhead / keep widths up

Usage: python tools/r5_experiments.py [n_points] [reps]
"""

from __future__ import annotations

import functools
import os
import statistics
import sys
import time

os.environ.setdefault("BPPP_ENGINE", "jax")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulletproofspp_tpu.core import ec
from bulletproofspp_tpu.core.fields import R
from bulletproofspp_tpu.ops import curve, limb
from bulletproofspp_tpu.ops import pallas_field as pf
from bulletproofspp_tpu.ops.engine import _interleave_endo
from bulletproofspp_tpu import native
import random

NLIMB = pf.NLIMB


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


_null_fn = jax.jit(lambda x: x + 1)
_null_arg = jnp.zeros((1,), jnp.uint32)
sync(_null_fn(_null_arg))


def null_time():
    t0 = time.perf_counter()
    sync(_null_fn(_null_arg))
    return time.perf_counter() - t0


def timed(label, fn, reps=5, per_lane=None):
    fn()
    nets = []
    for _ in range(reps):
        tn = null_time()
        t0 = time.perf_counter()
        fn()
        nets.append(time.perf_counter() - t0 - tn)
    med = statistics.median(nets)
    extra = f"  {med / per_lane * 1e9:7.2f} ns/lane" if per_lane else ""
    print(f"{label:52s} {med * 1e3:9.3f} ms{extra}", flush=True)
    return med


# --- variant kernels -------------------------------------------------------


def _sr_kernel_noselect(k2, d, s, tx, ty2, tz, ox, oy, oz):
    """select_reduce with the one-hot select replaced by a fixed slice
    (same table traffic, same padd count, no select work)."""
    k2v = k2[:]
    _ = d[:]
    _ = s[:]
    selx = tx[16:32, :]
    sely = ty2[16:32, :]
    selz = tz[16:32, :]
    p = (selx, sely, selz)
    w = p[0].shape[-1]
    while w > ox.shape[-1]:
        h = w // 2
        p = pf._padd_body(k2v, *(t[:, :h] for t in p), *(t[:, h : 2 * h] for t in p))
        w = h
    ox[:], oy[:], oz[:] = p


def _sr_kernel(k2, d, s, tx, ty2, tz, ox, oy, oz):
    k2v = k2[:]
    dv = d[:]
    iv = dv + 9 * s[:]
    blk = dv.shape[-1]
    selx = jnp.zeros((NLIMB, blk), jnp.uint32)
    sely = jnp.zeros((NLIMB, blk), jnp.uint32)
    selz = jnp.zeros((NLIMB, blk), jnp.uint32)
    for k in range(9):
        mx = dv == k
        selx = selx + jnp.where(mx, tx[16 * k : 16 * k + 16, :], jnp.uint32(0))
        selz = selz + jnp.where(mx, tz[16 * k : 16 * k + 16, :], jnp.uint32(0))
    for k in range(18):
        sely = sely + jnp.where(iv == k, ty2[16 * k : 16 * k + 16, :], jnp.uint32(0))
    p = (selx, sely, selz)
    w = blk
    while w > ox.shape[-1]:
        h = w // 2
        p = pf._padd_body(k2v, *(t[:, :h] for t in p), *(t[:, h : 2 * h] for t in p))
        w = h
    ox[:], oy[:], oz[:] = p


@functools.partial(jax.jit, static_argnames=("blk", "out_w", "noselect"))
def sr_variant(tx_flat, ty2_flat, tz_flat, absd, sgn, blk=1024, out_w=128, noselect=False):
    rows, L = absd.shape
    assert L % blk == 0
    nblk = L // blk
    ms = pltpu.VMEM
    tspec9 = pl.BlockSpec((144, blk), lambda i, r: (0, i), memory_space=ms)
    tspec18 = pl.BlockSpec((288, blk), lambda i, r: (0, i), memory_space=ms)
    dspec = pl.BlockSpec((1, blk), lambda i, r: (0, r * nblk + i), memory_space=ms)
    ospec = pl.BlockSpec((NLIMB, out_w), lambda i, r: (0, r * nblk + i), memory_space=ms)
    kspec = pl.BlockSpec((NLIMB, 1), lambda i, r: (0, 0), memory_space=ms)
    factor = blk // out_w
    out = jax.ShapeDtypeStruct((NLIMB, rows * (L // factor)), jnp.uint32)
    k2 = jnp.asarray(pf._kc())
    dflat = absd.astype(jnp.uint32).reshape(1, rows * L)
    sflat = sgn.astype(jnp.uint32).reshape(1, rows * L)
    kern = _sr_kernel_noselect if noselect else _sr_kernel
    return pl.pallas_call(
        kern,
        grid=(nblk, rows),
        in_specs=[kspec, dspec, dspec, tspec9, tspec18, tspec9],
        out_specs=(ospec, ospec, ospec),
        out_shape=(out, out, out),
    )(k2, dflat, sflat, tx_flat, ty2_flat, tz_flat)


def _copy_kernel(x, o):
    o[:] = x[:] + jnp.uint32(1)


@functools.partial(jax.jit, static_argnames=("blk",))
def grid_copy(x, blk=1024):
    rows, L = 33, x.shape[-1]
    nblk = L // blk
    spec = pl.BlockSpec((NLIMB, blk), lambda i, r: (0, i), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((NLIMB, blk), lambda i, r: (0, r * nblk + i), memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((NLIMB, rows * L), jnp.uint32)
    return pl.pallas_call(
        _copy_kernel,
        grid=(nblk, rows),
        in_specs=[spec],
        out_specs=ospec,
        out_shape=out,
    )(x)


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

    # H1: padd chain rate vs block width
    P = tuple(jnp.tile(t[:, :1], (1, L)) for t in (px, py, pz))
    for blk in (128, 256, 512, 1024, 2048):
        REP = 8

        @jax.jit
        def chain(p, blk=blk):
            for _ in range(REP):
                p = pf.padd_pallas(p, p, block=blk)
            return p

        t = timed(f"padd chain x{REP} block={blk}", lambda c=chain: sync(c(P)), reps)
        print(f"{'':52s}   -> {t / REP / L * 1e9:6.2f} ns/lane-padd", flush=True)

    # H2: fixed per-program cost (grid 64*33 trivial copy)
    xs = jnp.asarray(np.random.randint(0, 1 << 16, size=(NLIMB, L), dtype=np.uint32))
    t = timed("grid (64,33) copy (16,1024) blocks", lambda: sync(grid_copy(xs, blk=1024)), reps)
    print(f"{'':52s}   -> {t / (33 * (L // 1024)) * 1e6:6.2f} us/program", flush=True)

    # tables for the select variants
    tf = jax.jit(pf.table_flat_pallas)
    fx, fy2, fz = tf(px, py, pz)
    jax.block_until_ready((fx, fy2, fz))

    # H3: select vs no-select at blk=1024
    timed("SR blk=1024 out=128 (current)", lambda: sync(sr_variant(fx, fy2, fz, absd, sgn, 1024, 128)), reps, per_lane=L)
    timed("SR blk=1024 out=128 NOSELECT", lambda: sync(sr_variant(fx, fy2, fz, absd, sgn, 1024, 128, noselect=True)), reps, per_lane=L)

    # H4: wider blocks
    timed("SR blk=2048 out=256", lambda: sync(sr_variant(fx, fy2, fz, absd, sgn, 2048, 256)), reps, per_lane=L)
    timed("SR blk=2048 out=128", lambda: sync(sr_variant(fx, fy2, fz, absd, sgn, 2048, 128)), reps, per_lane=L)
    pass  # blk=4096 OOMs VMEM (18.2M > 16M)
    timed("SR blk=512 out=128", lambda: sync(sr_variant(fx, fy2, fz, absd, sgn, 512, 128)), reps, per_lane=L)


if __name__ == "__main__":
    main()
