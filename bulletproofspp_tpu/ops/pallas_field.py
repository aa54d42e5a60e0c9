"""Pallas TPU kernel: fused complete point addition.

The XLA path (ops.curve.padd) is a chain of ~40 elementwise field ops; XLA
fuses aggressively but still materializes intermediates between fusion
boundaries.  This kernel computes the ENTIRE complete addition (12 field
muls + additions, Renes–Costello–Batina a=0) for a block of lanes inside
one Pallas program, so every intermediate limb plane lives in
VMEM/registers.

Layout notes (pallas_guide): arrays are (16, L) uint32 — the limb axis
maps to sublanes (16 = 2 x 8 int32 tiles), lanes map to the 128-wide lane
dimension.  Mosaic restrictions shape the code: no 3-D tensors, no
reshapes, no dynamic_(update_)slice/scatter — partial-product columns and
reduction folds are built from static slices + row-padding concatenates
only; carries use the packed-bit ripple resolution (_carry), and products
stay in a 17-row deferred form (c17) between ops (_padd_body docstring).

Correctness is pinned against the exact host engine in interpret mode on
CPU (tests/test_pallas.py) and exercised compiled on the real chip by the
production MSM path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limb

_KC = None


def _kc() -> np.ndarray:
    """(17, 4) uint32 kernel constants (Mosaic kernels cannot capture
    array constants, so these ride in as an input):
      col 0: K2    = 2p - 2^256 + 1       (carried 16-row subtrahend)
      col 1: K2L   = (-(2^17-1)*S16) % p  (lazy 16-row subtrahend)
      col 2: K2_17 = (1 - 2^272) % p      (carried 17-row subtrahend)
      col 3: K2L17 = (-(2^17-1)*S17) % p  (lazy 17-row subtrahend)
    where Sk = sum_{i<k} 2^{16 i}; see _subs for the complement
    identities each offsets.  Every value is < 2^256 (16 limbs); row 16
    is zero padding so a 17-row view is a value-preserving PURE SLICE —
    Mosaic rejects concatenating a lane-offset column slice with fresh
    zeros ("offset mismatch on non-concat dimension"), so the kernels
    must never _pad_rows these constants."""
    global _KC
    if _KC is None:
        from ..core.fields import Q

        s16 = sum(1 << (16 * i) for i in range(NLIMB))
        s17 = s16 + (1 << (16 * NLIMB))
        k2l = limb.pack_int((-((2**17 - 1) * s16)) % Q)
        k2_17 = limb.pack_int((1 - (1 << 272)) % Q)
        k2l17 = limb.pack_int((-((2**17 - 1) * s17)) % Q)
        kc16 = np.stack([limb._k2(), k2l, k2_17, k2l17], axis=1).astype(np.uint32)
        _KC = np.concatenate([kc16, np.zeros((1, 4), np.uint32)], axis=0)
    return _KC

NLIMB = limb.NLIMB
MASK = limb.MASK
C_LOW = limb.C_LOW
B3 = 21


def _sum_rows(x):
    """Sum over the limb (sublane) axis -> (1, BL), as a halving tree of
    static slice adds (axis-0 reductions and unsigned reductions are not
    reliably lowerable on Mosaic; slices + adds are)."""
    k = x.shape[0]
    while k > 1:
        h = k // 2
        lo, hi = x[:h], x[h : 2 * h]
        x = jnp.concatenate([lo + hi, x[2 * h :]], axis=0) if k % 2 else lo + hi
        k = k - h
    return x


def _carry(x):
    """Exact carry propagation over the limb axis: (K, BL) uint32 of any
    magnitude -> (K+1, BL) limbs < 2^16, same total value.

    Replaces the Kogge-Stone prefix (log2(K) full-width passes, ~750
    element-ops/lane at K=16) with a PACKED single-bit ripple resolution
    (~280 ops/lane):

      1. one split pass: t = (x & MASK) + shift_up(x >> 16).  For ANY
         uint32 limbs, t <= (2^16-1) + (2^16-1) = 2^17 - 2, so the
         residual carries g = t >> 16 are single bits, and g=1 forces
         d = t - 2^16 <= 2^16 - 2 < MASK, hence propagate p = [d == MASK]
         and g are never both set at a position.
      2. pack the per-limb bits into ONE uint32 per lane (bit i = limb i)
         and resolve the whole ripple with an integer addition:
         U = u << 1 (g_i generates a carry INTO limb i+1), s = v + U;
         the adder's internal carries are k = s ^ v ^ U, and the true
         carry into limb i is bit i of  c = k | U.
         Soundness: the ripple recurrence is c_{i+1} = g_i | (p_i & c_i).
         In the addition, a carry entering a run of propagate bits
         (v bits = 1) ripples through it exactly; g_i => p_i = 0 ensures
         generated and propagated carries never collide (by induction
         k_i & U_i = 0: if U_i = 1 then v_{i-1} = 0, so
         k_i = U_{i-1} & k_{i-1} = 0), making c = k + U disjoint and the
         recurrence exact.
      3. unpack: out = (d + ((c >> i) & 1)) & MASK per limb i.

    Top-limb safety: the packed words use bits 0..K+1 <= 31 (K <= 30
    everywhere here), and the total value < 2^{16(K+1)} guarantees no
    carry out of the extended top row.
    """
    hi = x >> 16
    t = (
        jnp.concatenate([x & MASK, jnp.zeros_like(x[:1])], axis=0)
        + jnp.concatenate([jnp.zeros_like(hi[:1]), hi], axis=0)
    )
    return _resolve(t)


def _carry_pre(x):
    """_carry for inputs whose limbs are ALREADY <= 2^17 - 2 (e.g. the
    raw sum of two carried values, or a carried value plus a <= 977*2
    fold term): the split pass is the identity, so go straight to the
    packed resolution.  Output gains one row for the possible top carry.
    """
    return _resolve(jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0))


def _resolve(t):
    """Packed-ripple resolution for t with limbs <= 2^17 - 2 (so g is a
    single bit and g=1 forces d < MASK; see _carry)."""
    K1 = t.shape[0]
    d = t & MASK
    g = t >> 16
    # per-row bit weights as splat-constant rows (scalar splats lower
    # everywhere; vector-shift-by-iota does not)
    bl = t.shape[1]
    w = jnp.concatenate(
        [jnp.full((1, bl), np.uint32(1 << i), jnp.uint32) for i in range(K1)], axis=0
    )
    # g/p are 0/1: gate the weight rows with selects instead of
    # multiplies (the VPU's u32 mul runs at ~half its add/select rate)
    zero = jnp.zeros_like(w)
    u = _sum_rows(jnp.where(g != 0, w, zero))
    v = _sum_rows(jnp.where(d == MASK, w, zero))
    uu = u << 1
    s = v + uu
    c = (s ^ v ^ uu) | uu
    # bit i of c, as 0/1 per row ((c & 2^i) == 2^i; unsigned min/ne do
    # not legalize on Mosaic, eq does)
    return (d + ((c & w) == w).astype(jnp.uint32)) & MASK


def _pad_rows(x, before: int, after: int):
    """Concat-pad along the limb axis (row scatter without scatter ops)."""
    parts = []
    if before:
        parts.append(jnp.zeros((before, x.shape[1]), jnp.uint32))
    parts.append(x)
    if after:
        parts.append(jnp.zeros((after, x.shape[1]), jnp.uint32))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else x


def _lazy_fold(x):
    """Fold limbs >= 16 into the low part WITHOUT carrying (bounds proven
    at call sites; see ops.limb._lazy_fold) — concat-padding only."""
    K = x.shape[0]
    if K <= NLIMB:
        return x
    lo, hi = x[:NLIMB], x[NLIMB:]
    h = K - NLIMB
    ncols = max(NLIMB, h + 2)
    return (
        _pad_rows(lo, 0, ncols - NLIMB)
        + _pad_rows(hi * jnp.uint32(C_LOW), 0, ncols - h)
        + _pad_rows(hi, 2, ncols - h - 2)
    )


def _fold_rows(c):
    """Lazily fold every row >= 16 of a CARRIED (R, L) value back into
    the 16-limb window (generalizes the single-top-limb fold of
    ops.limb._fold_top_lazy to R <= 19): row 16+j (< 2^16) contributes
    o_j * 2^{16 j} * (2^32 + 977), i.e. o_j*977 at row j and o_j at
    row j+2.  Output: 16 LAZY rows, limbs < 2^16 + (R-16)*978*2^16
    < 2^28 for R <= 19 (u32-safe); callers state the resulting VALUE
    bound (which drives whether the following carry may skip its split
    pass and whether _fold_tail's o-in-{0,1} window holds)."""
    lo, hi = c[:NLIMB], c[NLIMB:]
    out = lo
    for j in range(hi.shape[0]):
        o = hi[j : j + 1]
        out = (
            out
            + _pad_rows(o * jnp.uint32(C_LOW), j, NLIMB - 1 - j)
            + _pad_rows(o, j + 2, NLIMB - 3 - j)
        )
    return out


def _fold_tail(c):
    """6-limb tail fold of a carried value < 2^256 + 2^80 (see ops.limb)."""
    o = c[NLIMB : NLIMB + 1]
    extra = _pad_rows(o * jnp.uint32(C_LOW), 0, 5) + _pad_rows(o, 2, 3)
    # limbs <= (2^16-1) + 977 <= 2^17-2: skip the split pass
    head = _carry_pre(c[:6] + extra)  # (7, ...): top row provably 0
    return jnp.concatenate([head[:6], c[6:NLIMB]], axis=0)


def _add(a, b):
    """Field add for CARRIED operands of 16 or 17 rows; 17-row (c17)
    operands may carry values up to ~2^271 but the two operands' values
    must SUM below 2^272 (callers document this).  Output: fully
    carried 16 rows (f16)."""
    Ra, Rb = a.shape[0], b.shape[0]
    R = max(Ra, Rb)
    if Ra < R:
        a = _pad_rows(a, 0, R - Ra)
    if Rb < R:
        b = _pad_rows(b, 0, R - Rb)
    if R == NLIMB:
        # both < 2^256: a+b limbs <= 2^17-2 and the folded value's
        # limbs are <= 2^16-1+977: both carries skip the split pass
        return _fold_tail(_carry_pre(_fold_rows(_carry_pre(a + b))))
    # 17-row: limbs <= 2^17-2 (pre-carry OK) -> 18 carried rows whose
    # top row is provably ZERO (value < 2^272), trimmed; folding row 16
    # (o < 2^16) leaves 16 lazy rows < 2^26 (full carry) and value
    # < 2^256 + o*(2^32+977) < 2^256 + 2^49 -> tail fold exact.
    c = _carry_pre(a + b)[: NLIMB + 1]
    return _fold_tail(_carry(_fold_rows(c)))


def _subs(kc):
    """Subtraction closures over the (17, 4) kernel-constant input
    (Mosaic rejects captured array constants, so the fold offsets arrive
    as inputs; see _kc).  Both accept 16- OR 17-row operands (the c17
    deferred-reduction form, value < 2^271):

      sub(a, b)      — b CARRIED (limbs < 2^16): complement identity
                       sum_i (0xffff - b_i) 2^{16 i} = (2^{16 R} - 1) - b
                       so a - b == a + w + ((1 - 2^{16 R}) mod p); the
                       R=16 offset is K2 = 2p - 2^256 + 1 (identical to
                       limb.sub), R=17 is K2_17 = (1 - 2^272) mod p.
      sub_lazy(a, b) — b LAZY (limbs <= 2^17 - 2, e.g. a raw t0 + t1
                       sum of carried values): widen the complement to
                       W17 = 2^17 - 1 and compensate with
                       K2L(R) = (-(W17 * sum_{i<R} 2^{16 i})) mod p.

    Bounds (R = 17 worst case): limb sums < 2^16 + 2^17 + 2^16 < 2^19
    (uint32-safe); total value < 2^271 + W17*S17 + p < 2^274, so the
    full carry's 18 rows have row 17 <= 3; _fold_rows leaves 16 lazy
    rows < 2^27 (full re-carry) and value < 2^256 + o_0*(2^32+977)
    + o_1*(2^48+977*2^16) < 2^256 + 2^51 — inside _fold_tail's exact
    window.  For R = 16 the value is < 2^256 + W17*S16 + p < 2^259
    (top limb <= 6, folded limbs <= 2^16-1 + 6*977: pre-carry, value
    < 2^256 + 2^36), as before."""
    def _general(a, b, w, c16, c17):
        Ra, Rb = a.shape[0], b.shape[0]
        col = c16 if Rb == NLIMB else c17
        R = max(Ra, Rb)
        if Ra < R:
            a = _pad_rows(a, 0, R - Ra)
        if Rb < R:
            w = _pad_rows(w, 0, R - Rb)
        # pure slice of the (17, 4) constant — row 16 is zero padding,
        # so the R-row view is value-correct for both R = 16 and 17 and
        # never needs a concat (see _kc: Mosaic rejects padding a
        # lane-offset column slice)
        k = kc[:R, col : col + 1]
        c = _carry(a + w + k)  # (R+1) carried rows
        if R == NLIMB:
            return _fold_tail(_carry_pre(_fold_rows(c)))
        return _fold_tail(_carry(_fold_rows(c)))

    def sub(a, b):
        return _general(a, b, jnp.uint32(MASK) - b, 0, 2)

    def sub_lazy(a, b):
        return _general(a, b, jnp.uint32(2 * MASK + 1) - b, 1, 3)

    return sub, sub_lazy


def _make_sub(kc):
    """Carried-operand subtract (table negations)."""
    return _subs(kc)[0]


def _merge_off(p1, o1, p2, o2):
    """Add two row planes placed at limb offsets o1 <= o2 (overlapping)
    into one plane at offset o1: only the overlapping rows pay adds, the
    disjoint head/tail rows are concatenated through untouched."""
    r1, r2 = p1.shape[0], p2.shape[0]
    e1, e2 = o1 + r1, o2 + r2
    ov_end = min(e1, e2)
    assert o1 <= o2 <= e1, (o1, o2, e1)
    parts = [p1[: o2 - o1]] if o2 > o1 else []
    parts.append(p1[o2 - o1 : ov_end - o1] + p2[: ov_end - o2])
    if e1 > ov_end:
        parts.append(p1[ov_end - o1 :])
    elif e2 > ov_end:
        parts.append(p2[ov_end - o2 :])
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _mul_c17(a, b):
    """(16, BL) x (16, BL) -> a*b mod p in the c17 deferred form: 17
    CARRIED rows (limbs < 2^16), value < 2^266.  Partial products as 16-row
    planes at limb offsets 0..16: 16 broadcast multiplies, no 3-D
    tensors.  Step i combines lo_i with the previous step's hi (both
    land at offset i, rows < 2^17); the 17 planes are then summed by a
    balanced offset-merge tree (_merge_off) in which only overlapping
    rows pay adds — ~2.4k element-ops/lane versus ~8.2k for the
    sequential 32-row padded-accumulator form (the columns are the same
    terms in a different association order, all partial sums bounded by
    the final column sums < 16 * 2^17 = 2^21).  BOTH reduction folds
    stack lazily (< 2*979*2^21 < 2^32).  The lazy value can reach
    ~2^266, so the first carry's top limb is up to ~2^11 with arbitrary
    low limbs — one more lazy top-fold + full carry is required before
    the 6-limb tail fold is exact (see ops.limb.mul; dropping it loses
    a 2^96 carry on saturated-limb inputs)."""
    parts = []
    hi_prev = None
    for i in range(NLIMB):
        prod = a[i : i + 1, :] * b  # (16, BL), exact in uint32
        lo = prod & MASK
        hi = prod >> 16
        parts.append((lo if hi_prev is None else lo + hi_prev, i))  # rows < 2^17
        hi_prev = hi
    parts.append((hi_prev, NLIMB))
    while len(parts) > 1:
        nxt = [
            (_merge_off(*parts[j], *parts[j + 1]), parts[j][1])
            for j in range(0, len(parts) - 1, 2)
        ]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    acc = parts[0][0]  # (32, BL) at offset 0
    return _carry(_lazy_fold(_lazy_fold(acc)))


def _mul(a, b):
    """Fully reduced product: f16 x f16 -> f16 (carried 16 rows,
    value < 2^256).  Use for values that feed another mul or leave the
    kernel; additive consumers should take _mul_c17 and absorb the top
    row into their own reduction."""
    c = _mul_c17(a, b)
    # folded limbs < 2^16 + 2^16*977 < 2^26 (full carry); value
    # < 2^256 + 2^49 -> tail fold exact
    return _fold_tail(_carry(_fold_rows(c)))


def _mul_small(a, k: int, c17: bool = False):
    """a * k mod p for a small host constant 0 <= k <= 32; a carried
    16 or 17 rows (17-row value < 2^266, so k*value < 2^271).  Output
    f16, or the c17 form when c17=True (17 carried rows, value
    < k * 2^266 < 2^271)."""
    assert 0 <= k <= 32, k
    c = _carry(a * jnp.uint32(k))  # product limbs < k * 2^16 < 2^21
    if a.shape[0] == NLIMB + 1:
        # value < k * 2^266 < 2^272 for k <= 32: row 17 provably zero
        c = c[: NLIMB + 1]
    if c17:
        return c
    # folded limbs < 2^16 + 2^15*977 < 2^26 (full carry); value
    # < 2^256 + 2^15*(2^32+977) < 2^256 + 2^48 -> tail fold exact
    return _fold_tail(_carry(_fold_rows(c)))


def _padd_body(kc, x1, y1, z1, x2, y2, z2):
    """RCB complete addition (same algebra as ops.curve.padd; the small
    3x multiple and the Karatsuba-correction subtrahends are restructured
    for op count: 3*t0 as one mul_small instead of two carried adds, and
    t0+t1 etc. fed to sub_lazy as raw limb sums — both are ~10x cheaper
    than a carried field add).

    Reduction scheduling: every product stays in the 17-row carried c17
    form (value < 2^266) because every consumer here is additive — the
    adds/subs absorb the extra top row into the single reduction they
    run anyway, so each mul skips its ~560-op/lane final fold; only
    values feeding another mul (the t3/t4/t5 sub outputs, t0_3, z3t,
    t1m, y3b) or leaving the kernel are fully carried f16."""
    mc, a = _mul_c17, _add
    s, sl = _subs(kc)
    t0 = mc(x1, x2)
    t1 = mc(y1, y2)
    t2 = mc(z1, z2)
    # t0+t1 etc: 17-row lazy sums, limbs <= 2^17-2 (sub_lazy b-operand)
    t3 = sl(mc(a(x1, y1), a(x2, y2)), t0 + t1)
    t4 = sl(mc(a(y1, z1), a(y2, z2)), t1 + t2)
    t5 = sl(mc(a(x1, z1), a(x2, z2)), t0 + t2)
    t0_3 = _mul_small(t0, 3)
    t2b = _mul_small(t2, B3, c17=True)  # value < 21*2^266 < 2^271
    z3t = a(t1, t2b)  # operand values sum < 2^266 + 2^271 < 2^272
    t1m = s(t1, t2b)
    y3b = _mul_small(t5, B3)
    x3 = s(mc(t3, t1m), mc(t4, y3b))
    y3 = a(mc(y3b, t0_3), mc(t1m, z3t))
    z3 = a(mc(z3t, t4), mc(t0_3, t3))
    return x3, y3, z3


def _pdbl_body(kc, x, y, z):
    """RCB complete doubling (same algebra as ops.curve.pdbl; the 8x and
    3x multiples run as single mul_smalls instead of add chains).
    Reduction scheduling as in _padd_body: products with additive
    consumers stay c17; mul inputs (z3, t1, t2, t0s, m(x,y)) and kernel
    outputs are f16."""
    m, mc, a = _mul, _mul_c17, _add
    s, _ = _subs(kc)
    t0 = mc(y, y)
    z3 = _mul_small(t0, 8)
    t1 = m(y, z)
    t2 = _mul_small(mc(z, z), B3)
    x3 = mc(t2, z3)
    y3 = a(t0, t2)  # 2^266 + 2^256 < 2^272
    z3 = m(t1, z3)
    t0s = s(t0, _mul_small(t2, 3, c17=True))
    y3 = a(x3, mc(t0s, y3))  # 2^266 + 2^266 < 2^272
    x3 = mc(t0s, m(x, y))
    x3 = a(x3, x3)  # 2 * 2^266 < 2^272
    return x3, y3, z3


def _kernel(k2, x1, y1, z1, x2, y2, z2, ox, oy, oz):
    r = _padd_body(k2[:], x1[:], y1[:], z1[:], x2[:], y2[:], z2[:])
    ox[:], oy[:], oz[:] = r


# ---------------------------------------------------------------------------
# Fused Horner: the MSM's 33-row accumulation (4 doublings + 1 add per
# row at width 1) is ~165 point ops of tiny width — dispatch/latency
# noise as XLA ops.  One Pallas program runs the whole loop in VMEM.
# ---------------------------------------------------------------------------


def _horner_kernel(k2, rx, ry, rz, ox, oy, oz):
    rows = rx.shape[-1]
    k2v = k2[:]
    rxv, ryv, rzv = rx[:], ry[:], rz[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, rxv.shape, 1)

    def pick(v, r):
        # dynamic LANE indexing is not lowerable on Mosaic (must be a
        # multiple of 128); a masked reduction over the 33 lanes is
        # Mosaic lacks unsigned reductions; limbs are < 2^16 so the int32
        # round-trip is exact
        masked = jnp.where(lane == r, v, jnp.uint32(0)).astype(jnp.int32)
        return jnp.sum(masked, axis=1, keepdims=True, dtype=jnp.int32).astype(jnp.uint32)

    def body(r, acc):
        x, y, z = acc
        for _ in range(4):
            x, y, z = _pdbl_body(k2v, x, y, z)
        return _padd_body(k2v, x, y, z, pick(rxv, r), pick(ryv, r), pick(rzv, r))

    zero = jnp.zeros((NLIMB, 1), jnp.uint32)
    one = jnp.concatenate([jnp.ones((1, 1), jnp.uint32), jnp.zeros((NLIMB - 1, 1), jnp.uint32)], 0)
    acc = jax.lax.fori_loop(0, rows, body, (zero, one, zero))
    ox[:], oy[:], oz[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def horner_pallas(rx, ry, rz, interpret: bool = False):
    """Full Horner accumulation: inputs (16, ROWS) row sums MSB-first,
    output (16, 1) projective accumulator.  ONE kernel launch for what is
    otherwise ~165 tiny point ops."""
    spec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)
    out = jax.ShapeDtypeStruct((NLIMB, 1), jnp.uint32)
    k2 = jnp.asarray(_kc())
    return pl.pallas_call(
        _horner_kernel,
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(out, out, out),
        interpret=interpret,
    )(k2, rx, ry, rz)


# ---------------------------------------------------------------------------
# Fused lane reduction: the MSM's dominant stage.  Summing the one-hot
# selected points over lanes is 33*L complete adds; as repeated XLA/
# padd_auto calls it runs at ~half the fused-padd rate (per-level pad/
# reshape traffic, narrow tails).  Here each launch narrows a row-major
# (16, R*W) lane array by 8x (blocks of 8*128 reduce 1024 -> 128 with
# three in-VMEM halving adds, no wasted lanes), and a final launch
# roll-reduces the last 128 lanes per row and runs the whole Horner
# accumulation — 4 launches total for a 65536-lane MSM.
# ---------------------------------------------------------------------------


def _reduce_block_kernel(k2, x1, y1, z1, ox, oy, oz):
    """(16, BLK) -> (16, BLK//8) by three halving complete adds."""
    k2v = k2[:]
    p = (x1[:], y1[:], z1[:])
    w = p[0].shape[-1]
    target = ox.shape[-1]
    while w > target:
        h = w // 2
        a = tuple(t[:, :h] for t in p)
        b = tuple(t[:, h : 2 * h] for t in p)
        p = _padd_body(k2v, *a, *b)
        w = h
    ox[:], oy[:], oz[:] = p


@functools.partial(jax.jit, static_argnames=("factor", "interpret"))
def reduce_block_pallas(p, factor: int = 8, interpret: bool = False):
    """Narrow (16, W) lane planes by ``factor`` (2/4/8): W must be a
    multiple of 128*factor; blocks never cross 128*factor boundaries, so
    callers with R independent rows of W/R lanes each keep rows intact
    as long as W/R is a multiple of 128*factor."""
    x1, y1, z1 = p
    W = x1.shape[-1]
    blk = 128 * factor
    assert W % blk == 0 and factor in (2, 4, 8)
    grid = W // blk
    spec = pl.BlockSpec((NLIMB, blk), lambda i: (0, i), memory_space=pl.ANY if interpret else pltpu.VMEM)
    ospec = pl.BlockSpec((NLIMB, 128), lambda i: (0, i), memory_space=pl.ANY if interpret else pltpu.VMEM)
    kspec = pl.BlockSpec((NLIMB + 1, 4), lambda i: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM)
    out = jax.ShapeDtypeStruct((NLIMB, W // factor), jnp.uint32)
    k2 = jnp.asarray(_kc())
    return pl.pallas_call(
        _reduce_block_kernel,
        grid=(grid,),
        in_specs=[kspec] + [spec] * 3,
        out_specs=(ospec, ospec, ospec),
        out_shape=(out, out, out),
        interpret=interpret,
    )(k2, x1, y1, z1)


def _table_flat_kernel(k2, px, py, pz, ox, oy, oz):
    """Multiple tables 0P..8P for a block of lanes, written in the FLAT
    layout the select kernel reads: x/z as (144, BLK) (9 entries x 16
    limbs), y as (288, BLK) (18 signed entries).  7 complete adds + 9
    negations, all in VMEM."""
    k2v = k2[:]
    bx, by, bz = px[:], py[:], pz[:]
    blk = bx.shape[-1]
    zero = jnp.zeros((NLIMB, blk), jnp.uint32)
    one = jnp.concatenate([jnp.ones((1, blk), jnp.uint32), jnp.zeros((NLIMB - 1, blk), jnp.uint32)], 0)
    sub = _make_sub(k2v)
    entries = [(zero, one, zero), (bx, by, bz)]
    acc = (bx, by, bz)
    for _ in range(7):
        acc = _padd_body(k2v, *acc, bx, by, bz)
        entries.append(acc)
    ox[:] = jnp.concatenate([e[0] for e in entries], axis=0)
    oz[:] = jnp.concatenate([e[2] for e in entries], axis=0)
    ys = [e[1] for e in entries]
    nys = [sub(zero, y) for y in ys]
    oy[:] = jnp.concatenate(ys + nys, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def table_flat_pallas(px, py, pz, interpret: bool = False):
    """(16, L) projective base lanes -> flat tables (144, L), (288, L),
    (144, L) for select_reduce_pallas.  L must be a multiple of 1024."""
    L = px.shape[-1]
    assert L % 1024 == 0
    ms = pl.ANY if interpret else pltpu.VMEM
    spec = pl.BlockSpec((NLIMB, 1024), lambda i: (0, i), memory_space=ms)
    kspec = pl.BlockSpec((NLIMB + 1, 4), lambda i: (0, 0), memory_space=ms)
    o9 = pl.BlockSpec((144, 1024), lambda i: (0, i), memory_space=ms)
    o18 = pl.BlockSpec((288, 1024), lambda i: (0, i), memory_space=ms)
    k2 = jnp.asarray(_kc())
    return pl.pallas_call(
        _table_flat_kernel,
        grid=(L // 1024,),
        in_specs=[kspec, spec, spec, spec],
        out_specs=(o9, o18, o9),
        out_shape=(
            jax.ShapeDtypeStruct((144, L), jnp.uint32),
            jax.ShapeDtypeStruct((288, L), jnp.uint32),
            jax.ShapeDtypeStruct((144, L), jnp.uint32),
        ),
        interpret=interpret,
    )(k2, px, py, pz)


def _select_reduce_scratch_kernel(k2, d, s, px, py, pz, ox, oy, oz, tx, ty2, tz):
    """Fully-fused variant: the multiple table for each lane block is
    built ONCE into persistent VMEM scratch (at the first row program of
    the block — scratch survives across sequential grid steps on TPU)
    and reused by all 33 row programs; the table never exists in HBM.
    Grid is (lane_block, row) with row innermost."""
    k2v = k2[:]
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _build():
        bx, by, bz = px[:], py[:], pz[:]
        blk = bx.shape[-1]
        zero = jnp.zeros((NLIMB, blk), jnp.uint32)
        one = jnp.concatenate(
            [jnp.ones((1, blk), jnp.uint32), jnp.zeros((NLIMB - 1, blk), jnp.uint32)], 0
        )
        sub = _make_sub(k2v)
        entries = [(zero, one, zero), (bx, by, bz)]
        acc = (bx, by, bz)
        for _ in range(7):
            acc = _padd_body(k2v, *acc, bx, by, bz)
            entries.append(acc)
        tx[:] = jnp.concatenate([e[0] for e in entries], axis=0)
        tz[:] = jnp.concatenate([e[2] for e in entries], axis=0)
        ys = [e[1] for e in entries]
        nys = [sub(zero, y) for y in ys]
        ty2[:] = jnp.concatenate(ys + nys, axis=0)

    dv = d[:]
    iv = dv + 9 * s[:]
    blk = dv.shape[-1]
    selx = jnp.zeros((NLIMB, blk), jnp.uint32)
    sely = jnp.zeros((NLIMB, blk), jnp.uint32)
    selz = jnp.zeros((NLIMB, blk), jnp.uint32)
    txv, ty2v, tzv = tx[:], ty2[:], tz[:]
    for k in range(9):
        mx = dv == k
        selx = selx + jnp.where(mx, txv[16 * k : 16 * k + 16, :], jnp.uint32(0))
        selz = selz + jnp.where(mx, tzv[16 * k : 16 * k + 16, :], jnp.uint32(0))
    for k in range(18):
        sely = sely + jnp.where(iv == k, ty2v[16 * k : 16 * k + 16, :], jnp.uint32(0))

    p = (selx, sely, selz)
    w = blk
    while w > 128:
        h = w // 2
        p = _padd_body(k2v, *(t[:, :h] for t in p), *(t[:, h : 2 * h] for t in p))
        w = h
    ox[:], oy[:], oz[:] = p


@functools.partial(jax.jit, static_argnames=("interpret",))
def select_reduce_fused_pallas(px, py, pz, absd, sgn, interpret: bool = False):
    """Table build + one-hot select + first 8:1 reduction in ONE kernel:
    the table lives only in VMEM scratch (built once per lane block,
    reused across rows).  px/py/pz: (16, L) projective lanes; absd/sgn:
    (ROWS, L).  Returns (16, ROWS*L/8) row-major partials."""
    rows, L = absd.shape
    assert L % 1024 == 0
    nblk = L // 1024
    ms = pl.ANY if interpret else pltpu.VMEM
    pspec = pl.BlockSpec((NLIMB, 1024), lambda i, r: (0, i), memory_space=ms)
    dspec = pl.BlockSpec((1, 1024), lambda i, r: (0, r * nblk + i), memory_space=ms)
    ospec = pl.BlockSpec((NLIMB, 128), lambda i, r: (0, r * nblk + i), memory_space=ms)
    kspec = pl.BlockSpec((NLIMB + 1, 4), lambda i, r: (0, 0), memory_space=ms)
    out = jax.ShapeDtypeStruct((NLIMB, rows * (L // 8)), jnp.uint32)
    k2 = jnp.asarray(_kc())
    dflat = absd.astype(jnp.uint32).reshape(1, rows * L)
    sflat = sgn.astype(jnp.uint32).reshape(1, rows * L)
    return pl.pallas_call(
        _select_reduce_scratch_kernel,
        grid=(nblk, rows),
        in_specs=[kspec, dspec, dspec, pspec, pspec, pspec],
        out_specs=(ospec, ospec, ospec),
        out_shape=(out, out, out),
        scratch_shapes=[
            pltpu.VMEM((144, 1024), jnp.uint32),
            pltpu.VMEM((288, 1024), jnp.uint32),
            pltpu.VMEM((144, 1024), jnp.uint32),
        ],
        interpret=interpret,
    )(k2, dflat, sflat, px, py, pz)


def _select_reduce_kernel(k2, d, s, tx, ty2, tz, ox, oy, oz):
    """One (lane-block, row) program: one-hot select 1024 lanes' table
    entries for this row's digits, then reduce 1024 -> 128 with three
    halving complete adds.  Tables are blocked on lanes only, so with the
    row axis INNERMOST in the grid the table block is fetched once per
    lane block and reused across all rows (Pallas skips re-fetch when the
    block index is unchanged)."""
    k2v = k2[:]
    dv = d[:]  # (1, BLK) digit magnitudes
    iv = dv + 9 * s[:]  # signed index into the 18-entry y table
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
    while w > 128:
        h = w // 2
        p = _padd_body(k2v, *(t[:, :h] for t in p), *(t[:, h : 2 * h] for t in p))
        w = h
    ox[:], oy[:], oz[:] = p


@functools.partial(jax.jit, static_argnames=("interpret",))
def select_reduce_pallas(tx_flat, ty2_flat, tz_flat, absd, sgn, interpret: bool = False):
    """Fused one-hot digit selection + first 8:1 lane reduction.

    tx_flat/tz_flat: (144, L) flat tables (9 entries x 16 limbs);
    ty2_flat: (288, L) (18 signed entries).  absd/sgn: (ROWS, L).
    Returns (16, ROWS*L/8) row-major partials — select never touches HBM.
    """
    rows, L = absd.shape
    assert L % 1024 == 0
    nblk = L // 1024
    ms = pl.ANY if interpret else pltpu.VMEM
    tspec9 = pl.BlockSpec((144, 1024), lambda i, r: (0, i), memory_space=ms)
    tspec18 = pl.BlockSpec((288, 1024), lambda i, r: (0, i), memory_space=ms)
    # digits flattened row-major to (1, rows*L): block (r*nblk + i) is
    # exactly row r's lanes [i*1024, (i+1)*1024)
    dspec = pl.BlockSpec((1, 1024), lambda i, r: (0, r * nblk + i), memory_space=ms)
    ospec = pl.BlockSpec((NLIMB, 128), lambda i, r: (0, r * nblk + i), memory_space=ms)
    kspec = pl.BlockSpec((NLIMB + 1, 4), lambda i, r: (0, 0), memory_space=ms)
    out = jax.ShapeDtypeStruct((NLIMB, rows * (L // 8)), jnp.uint32)
    k2 = jnp.asarray(_kc())
    dflat = absd.astype(jnp.uint32).reshape(1, rows * L)
    sflat = sgn.astype(jnp.uint32).reshape(1, rows * L)
    return pl.pallas_call(
        _select_reduce_kernel,
        grid=(nblk, rows),
        in_specs=[kspec, dspec, dspec, tspec9, tspec18, tspec9],
        out_specs=(ospec, ospec, ospec),
        out_shape=(out, out, out),
        interpret=interpret,
    )(k2, dflat, sflat, tx_flat, ty2_flat, tz_flat)


def _tail_horner_kernel(rows, k2, x1, y1, z1, ox, oy, oz):
    """Input (16, rows*128) row-major; roll-reduce each row's 128 lanes,
    then Horner-accumulate the rows (MSB row first) into one point."""
    k2v = k2[:]
    sel = (x1[:], y1[:], z1[:])
    width = sel[0].shape[-1]
    shift = 64
    while shift >= 1:
        rolled = tuple(pltpu.roll(t, width - shift, 1) for t in sel)
        sel = _padd_body(k2v, *sel, *rolled)
        shift //= 2
    # row sum r now lives at lane r*128
    lane = jax.lax.broadcasted_iota(jnp.int32, (NLIMB, width), 1)

    def pick(v, r):
        masked = jnp.where(lane == r * 128, v, jnp.uint32(0)).astype(jnp.int32)
        return jnp.sum(masked, axis=1, keepdims=True, dtype=jnp.int32).astype(jnp.uint32)

    def body(r, acc):
        x, y, z = acc
        for _ in range(4):
            x, y, z = _pdbl_body(k2v, x, y, z)
        return _padd_body(k2v, x, y, z, pick(sel[0], r), pick(sel[1], r), pick(sel[2], r))

    z1c = jnp.zeros((NLIMB, 1), jnp.uint32)
    o1 = jnp.concatenate([jnp.ones((1, 1), jnp.uint32), jnp.zeros((NLIMB - 1, 1), jnp.uint32)], 0)
    acc = jax.lax.fori_loop(0, rows, body, (z1c, o1, z1c))
    ox[:], oy[:], oz[:] = acc


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def tail_horner_pallas(p, rows: int, interpret: bool = False):
    """(16, rows*128) row-major lane planes -> final (16, 1) point."""
    x1, y1, z1 = p
    assert x1.shape[-1] == rows * 128
    spec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)
    out = jax.ShapeDtypeStruct((NLIMB, 1), jnp.uint32)
    k2 = jnp.asarray(_kc())
    return pl.pallas_call(
        functools.partial(_tail_horner_kernel, rows),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(out, out, out),
        interpret=interpret,
    )(k2, x1, y1, z1)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def padd_pallas(p, q, block: int = 512, interpret: bool = False):
    """Complete addition over (16, L) lanes as a Pallas kernel.

    L must be a multiple of ``block`` (callers pad to lane buckets)."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    L = x1.shape[-1]
    bl = min(block, L)
    assert L % bl == 0
    spec = pl.BlockSpec((NLIMB, bl), lambda i: (0, i), memory_space=pl.ANY if interpret else pltpu.VMEM)
    kspec = pl.BlockSpec((NLIMB + 1, 4), lambda i: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM)
    out = jax.ShapeDtypeStruct((NLIMB, L), jnp.uint32)
    k2 = jnp.asarray(_kc())
    ox, oy, oz = pl.pallas_call(
        _kernel,
        grid=(L // bl,),
        in_specs=[kspec] + [spec] * 6,
        out_specs=(spec, spec, spec),
        out_shape=(out, out, out),
        interpret=interpret,
    )(k2, x1, y1, z1, x2, y2, z2)
    return ox, oy, oz
