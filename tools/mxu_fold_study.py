"""MXU formulation of the mod-p fold — the experiment ARCHITECTURE.md
headroom #2 promised (VERDICT r2 item 1a).

Question: the field mul's reduction folds limbs 16..31 of the
schoolbook accumulator back into the 16-limb window.  That fold IS a
constant linear map out = lo + W @ hi with W[j] = limbs of
2^{16(16+j)} mod p — a real contraction the MXU could execute.  Is an
int8-plane MXU formulation faster than the VPU fold the production
kernel uses (`pallas_field._lazy_fold` x2 + packed carry)?

Exactness constraints force the plane decomposition:
  - hi rows are < 2^21 (merge-tree column sums), W entries < 2^16;
    a direct u32 contraction accumulates 16 * 2^21 * 2^16 = 2^41 —
    overflows both u32 and the MXU's int32 accumulator per spec only
    if planes are too wide.
  - int8 MXU matmul (the only exact integer mode) takes signed 8-bit
    inputs: split hi into B-bit planes (ceil(21/B) of them) and W into
    C-bit planes (ceil(16/C)); products must satisfy
    16 * (2^B-1) * (2^C-1) < 2^31 (int32 accumulate) — easily met —
    but the RECOMBINATION back to u32 limbs must keep every shifted
    plane < 2^32: plane (k, m) carries weight 2^{Bk+Cm}, and shifts
    s mod 16 <= 15 with plane sums < 2^16 require B, C <= 6.
  - B = C = 6 => 4 x 3 = 12 matmuls of (16x16) @ (16xL) int8.

This module builds that exact formulation, verifies it bit-exactly
against the production fold on CPU, and counts the VPU-side element
ops (decompose + recombine + final carry) that surround the 12 MXU
dots.  Run with --tpu to also time both variants on the real chip.

Result (see BENCH_NOTES.md "MXU fold post-mortem"): the plane
unpack/repack VPU traffic alone exceeds the entire 557-op/lane VPU
fold it would replace; the MXU can't win regardless of how fast the
dots are.  Kept as an executable record of the dead end.

Reference for the op being studied: the 256-bit reduction in
/root/reference/src/Data/Field/Galois/FastPrime/Internal.hs:939-973.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from bulletproofspp_tpu.core.fields import Q
from bulletproofspp_tpu.ops import limb
from bulletproofspp_tpu.ops import pallas_field as pf

NLIMB = pf.NLIMB
B = 6  # hi-plane bit width
C = 6  # W-plane bit width
KH = 4  # ceil(21 / B) hi planes
KW = 3  # ceil(16 / C) W planes


def _w_const() -> np.ndarray:
    """(16, 16) fold matrix: W[j, i] = limb i of 2^{16(16+j)} mod p."""
    w = np.zeros((NLIMB, NLIMB), np.uint32)
    for j in range(NLIMB):
        w[j] = limb.pack_int(pow(2, 16 * (16 + j), Q))
    return w


def mxu_fold(acc):
    """(32, L) u32 (limbs < 2^21) -> (16, L) lazy rows, same value mod p,
    with the contraction expressed as 12 int8 matmuls (MXU-eligible).

    Exactness: hi = sum_k h_k 2^{6k} (h_k < 64), W = sum_m w_m 2^{6m}
    (w_m < 64); P_km = W_m^T @ h_k < 16*63*63 < 2^16 (int32-exact);
    out_i = lo_i + sum_km P_km[i] << (6k+6m), with shifts >= 16 moved
    one limb row up (s-16), every shifted plane < 2^16 * 2^15 < 2^31."""
    lo, hi = acc[:NLIMB], acc[NLIMB:]
    w = _w_const()
    groups: dict[int, list] = {}
    for k in range(KH):
        h_k = ((hi >> (B * k)) & (2**B - 1)).astype(jnp.int8)
        for m in range(KW):
            w_m = ((w >> (C * m)) & (2**C - 1)).astype(np.int8)
            # (16, L) = (16j -> 16i contraction): W_m[j, i]^T @ h_k[j, L]
            p_km = jax.lax.dot_general(
                jnp.asarray(w_m),
                h_k,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.uint32)
            groups.setdefault(B * k + C * m, []).append(p_km)
    # u32-safe recombination: same-shift planes sum first (<= 3 planes
    # each < 2^16 -> group < 3*2^16 < 2^18); shifts >= 16 move one limb
    # row up (residual <= 14); the worst row sum is lo (2^21) + groups
    # shifted by {0,6,12, 2,8,14} < 2^31 — just inside u32.  The top
    # row of an up-shifted group spills past limb 15 with weight 2^256
    # = 2^32+977 (mod p); it can reach 2^32 pre-977-scaling, so split
    # it into 16-bit halves before the sparse fold.
    out = lo
    for s, ps in sorted(groups.items()):
        g = ps[0]
        for p_km in ps[1:]:
            g = g + p_km
        if s < 16:
            out = out + (g << s)
            continue
        shifted = g << (s - 16)  # group < 2^18, s-16 <= 14 -> < 2^32
        out = out + pf._pad_rows(shifted[:-1], 1, 0)
        top = shifted[-1:]  # weight 2^256, < 2^32
        t_lo, t_hi = top & jnp.uint32(0xFFFF), top >> 16
        out = out + pf._pad_rows(t_lo * jnp.uint32(977), 0, NLIMB - 1)
        out = out + pf._pad_rows(t_hi * jnp.uint32(977), 1, NLIMB - 2)
        out = out + pf._pad_rows(t_lo, 2, NLIMB - 3)
        out = out + pf._pad_rows(t_hi, 3, NLIMB - 4)
    return out


def vpu_fold(acc):
    """The production fold: two lazy sparse folds (pallas_field)."""
    return pf._lazy_fold(pf._lazy_fold(acc))


def check_exact(n=64, seed=7):
    rng = np.random.default_rng(seed)
    acc = rng.integers(0, 1 << 21, size=(2 * NLIMB, n), dtype=np.uint32)
    accj = jnp.asarray(acc)
    vals = [
        sum(int(acc[i, j]) << (16 * i) for i in range(2 * NLIMB))
        for j in range(n)
    ]
    for name, fold in [("mxu", mxu_fold), ("vpu", vpu_fold)]:
        out = np.asarray(jax.jit(fold)(accj), np.uint64)
        got = [
            sum(int(out[i, j]) << (16 * i) for i in range(out.shape[0]))
            for j in range(n)
        ]
        assert all(g % Q == v % Q for g, v in zip(got, vals)), name
    print("exactness: OK (both folds match host integers mod p)")


def count_ops():
    from bulletproofspp_tpu.opcount import count_fn

    L = 256
    acc = jnp.zeros((2 * NLIMB, L), jnp.uint32)

    def chain(fold):
        # fold + the carry the mul needs afterwards (both variants
        # produce lazy rows that must be carried before use)
        return lambda x: pf._carry(fold(x))

    for name, fold in [("vpu", vpu_fold), ("mxu", mxu_fold)]:
        c = count_fn(chain(fold), acc, per_lane_axis_size=L)
        dot = c.get("other:dot_general", 0.0)
        vpu_side = c.get("mul", 0) + c.get("elem", 0) + c.get("copy", 0)
        print(
            f"{name}: vpu-side ops/lane = {vpu_side:7.1f} "
            f"(mul {c.get('mul',0):.1f}, elem {c.get('elem',0):.1f}, "
            f"copy {c.get('copy',0):.1f}); mxu dot elems/lane = {dot:.1f}"
        )


def bench_tpu(iters=64, L=65536):
    """Time fold+carry chains on the real chip (both as plain jitted XLA
    for an apples-to-apples launch; the relative ordering is what the
    study needs — if the MXU variant loses even with its dots free of
    Mosaic constraints, a Pallas variant cannot win)."""
    import time

    rng = np.random.default_rng(0)
    acc = jnp.asarray(rng.integers(0, 1 << 21, size=(2 * NLIMB, L), dtype=np.uint32))

    def chain(fold, k):
        def f(x):
            for _ in range(k):
                c = pf._carry(fold(jnp.concatenate([x, x], axis=0)))
                x = c[:NLIMB]
            return x

        return jax.jit(f)

    null = jax.jit(lambda x: x + 1)
    _ = np.asarray(null(acc))
    t0 = time.perf_counter()
    for _ in range(3):
        _ = np.asarray(null(acc))
    t_null = (time.perf_counter() - t0) / 3

    for name, fold in [("vpu", vpu_fold), ("mxu", mxu_fold)]:
        f = chain(fold, iters)
        _ = np.asarray(f(acc))  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            _ = np.asarray(f(acc))
        t = (time.perf_counter() - t0) / reps - t_null
        print(f"{name}: {t / iters / L * 1e9:8.3f} ns/lane-fold (net)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true", help="also time on device")
    args = ap.parse_args()
    check_exact()
    count_ops()
    if args.tpu:
        bench_tpu()
