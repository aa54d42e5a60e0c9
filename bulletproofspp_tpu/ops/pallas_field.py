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
only; carries use the packed-bit ripple resolution (_resolve_k).

Form discipline (round 4, replacing the r3 17-row c17 form): every value
is 16 rows.  The VPU's vector registers are (8, 128) tiles, so a 17-row
tensor pads every op to 24 sublanes (+41%); instead of keeping the 2^256
overflow in a 17th row, each carry WRAPS it back into the window through
the sparse-prime identity 2^256 = 2^32 + 977 (mod p) (_carry_wrap),
leaving a "w16" form: 16 rows, rows 0/2 lazily elevated (< 2^21), value
< 2^256 + 2^49.  Additive consumers take w16 directly; multiplications
need strict < 2^16 limbs and take the two-resolve _tighten.  Measured
tile accounting (opcount.padd_op_counts): the r3 c17 body issued 53k
tiled ops/lane-padd for 39.7k charged; the w16 body issues 44.3k for
35.4k (residual padding is the product merge tree's odd-row planes).

Correctness is pinned against the exact host engine in interpret mode on
CPU (tests/test_pallas.py, tests/test_pallas_forms.py incl. saturated
0xFFFF adversarial operands) and exercised compiled on the real chip by
the production MSM path.
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

# per-limb complement width for every subtraction (_sub docstring): must
# exceed any subtrahend limb.  Subtrahends are strict f16 (< 2^16), w16
# (< 2^21), or raw sums of two w16 (< 2^22) — 2^26 - 1 leaves margin.
W_COMP = (1 << 26) - 1


def _kc() -> np.ndarray:
    """(16, 1) uint32 kernel constant (Mosaic kernels cannot capture
    array constants, so it rides in as an input):
      K2W = (-(W_COMP * S16)) % p,   S16 = sum_{i<16} 2^{16 i}
    the complement offset of every subtraction: per-limb
    sum_i (W_COMP - b_i) 2^{16 i} = W_COMP*S16 - value(b), so
    a - b == a + (W_COMP - b per limb) + K2W  (mod p)."""
    global _KC
    if _KC is None:
        from ..core.fields import Q

        s16 = sum(1 << (16 * i) for i in range(NLIMB))
        _KC = limb.pack_int((-(W_COMP * s16)) % Q).reshape(NLIMB, 1).astype(np.uint32)
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


def _split16(x):
    """Split pass: x (16, BL) ARBITRARY uint32 limbs -> (t, o) with
    t (16, BL) limbs <= (2^16-1) + (2^16-1) = 2^17 - 2 and
    o (1, BL) = x[15] >> 16, such that value(x) = value(t) + o * 2^256."""
    hi = x >> 16
    t = (x & MASK) + jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:15]], axis=0)
    return t, hi[15:16]


def _resolve_k(t):
    """Packed single-bit ripple resolution: t (K, BL), K <= 30, limbs
    <= 2^17 - 2 -> (r, cb): r (K, BL) strict limbs < 2^16 and cb (1, BL)
    in {0, 1} the carry out of the top row; value(t) = value(r) +
    cb * 2^{16 K}.

    Replaces the Kogge-Stone prefix (log2(K) full-width passes, ~750
    element-ops/lane at K=16) with a PACKED resolution (~210):

      1. limbs <= 2^17 - 2 make the residual carries g = t >> 16 single
         bits, and g=1 forces d = t - 2^16 <= 2^16 - 2 < MASK, hence
         propagate p = [d == MASK] and g are never both set at a row.
      2. pack the per-row bits into ONE uint32 per lane (bit i = row i)
         and resolve the whole ripple with an integer addition:
         U = u << 1 (g_i generates a carry INTO row i+1), s = v + U;
         the adder's internal carries are k = s ^ v ^ U, and the true
         carry into row i is bit i of  c = k | U.
         Soundness: the ripple recurrence is c_{i+1} = g_i | (p_i & c_i).
         In the addition, a carry entering a run of propagate bits
         (v bits = 1) ripples through it exactly; g_i => p_i = 0 ensures
         generated and propagated carries never collide (by induction
         k_i & U_i = 0: if U_i = 1 then v_{i-1} = 0, so
         k_i = U_{i-1} & k_{i-1} = 0), making c = k + U disjoint and the
         recurrence exact.  Bit K of c is the top carry-out cb.
      3. unpack: out = (d + ((c & 2^i) == 2^i)) & MASK per row i.
    """
    K = t.shape[0]
    d = t & MASK
    g = t >> 16
    # per-row bit weights as splat-constant rows (scalar splats lower
    # everywhere; vector-shift-by-iota does not)
    bl = t.shape[1]
    w = jnp.concatenate(
        [jnp.full((1, bl), np.uint32(1 << i), jnp.uint32) for i in range(K)], axis=0
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
    r = (d + ((c & w) == w).astype(jnp.uint32)) & MASK
    return r, (c >> K) & jnp.uint32(1)


def _carry(x):
    """Exact carry: (K, BL) any uint32 -> (K+1, BL) strict limbs, same
    value (total value < 2^{16(K+1)} guarantees no carry out of the
    extended top row).  Kept for the analysis tools (tools/phase_bench,
    tools/mxu_fold_study); the kernel bodies use the wrapped forms."""
    hi = x >> 16
    t = (
        jnp.concatenate([x & MASK, jnp.zeros_like(x[:1])], axis=0)
        + jnp.concatenate([jnp.zeros_like(hi[:1]), hi], axis=0)
    )
    return _resolve_k(t)[0]


def _wrap(r, wv):
    """value(r) + wv * 2^256, with the overflow wrapped back into the
    16-row window through 2^256 = 2^32 + 977 (mod p): rows 0 and 2 get
    lazy additions (row0 += wv*977, row2 += wv).  r strict, wv (1, BL)."""
    return jnp.concatenate(
        [r[:1] + wv * jnp.uint32(C_LOW), r[1:2], r[2:3] + wv, r[3:]], axis=0
    )


def _carry_wrap(x):
    """x (16, BL) ARBITRARY uint32 limbs, value < 2^272 -> the w16 form:
    16 rows, row0 < 2^16 + w*977, row2 < 2^16 + w (w = o + cb < 2^16 the
    total 2^256 overflow), all other rows strict; value = value(x) mod p
    and < 2^256 + w*2^33.  ONE resolve: the 2^256 carry wraps back via
    the sparse-prime identity instead of occupying a 17th row (which
    would pad every consumer op to 24 sublanes).

    In-kernel callers have w <= 2^11 (mul-lazy inputs have x[15] < 2^26
    since value < 2^266; mul_small inputs have x[15] < 22*2^16), so w16
    limbs stay < 2^21 — documented per call site."""
    t, o = _split16(x)
    r, cb = _resolve_k(t)
    return _wrap(r, o + cb)


def _split_wrapped(y):
    """_split16 specialized to a _wrap output: only rows 0 and 2 can
    exceed 2^16 (their carries land in strict rows 1 and 3: sums
    <= (2^16-1) + hi < 2^17 - 2 for hi < 2^10), and row15 is strict so
    there is no 2^256 overflow.  Returns t (16, BL) limbs <= 2^17 - 2."""
    hi0 = y[0:1] >> 16
    hi2 = y[2:3] >> 16
    return jnp.concatenate(
        [y[0:1] & MASK, y[1:2] + hi0, y[2:3] & MASK, y[3:4] + hi2, y[4:]], axis=0
    )


def _tail(r, wv):
    """Exact 6-limb fold of value(r) + wv * 2^256 to strict f16,
    REQUIRING wv in {0, 1} and (wv = 1 => value(r) < 2^80): wv = 1 then
    forces r rows 5.. to zero so the 6-row window sum stays < 2^96 (no
    carry out of the head resolve), wv = 0 adds nothing.  Callers: wv is
    the carry bit of a second resolve on a value < 2^256 + 2^49, so
    wv = 1 forces the remainder r < 2^49."""
    extra = _pad_rows(wv * jnp.uint32(C_LOW), 0, 5) + _pad_rows(wv, 2, 3)
    # limbs <= (2^16-1) + 977 <= 2^17-2: directly resolvable; the carry
    # out is provably 0 (see above), drop it
    head, _cb = _resolve_k(r[:6] + extra)
    return jnp.concatenate([head, r[6:]], axis=0)


def _tighten(x):
    """x (16, BL) ARBITRARY uint32 limbs, value < 2^272 -> strict f16
    (all limbs < 2^16), same value mod p.  Two resolves: the first
    leaves a wrapped excess at rows 0/2 with value < 2^256 + 2^16*2^33
    < 2^256 + 2^49; the second resolve's carry bit cb then satisfies
    cb = 1 => remainder < 2^49, making the exact 6-limb _tail fold
    applicable."""
    y = _carry_wrap(x)
    r, cb = _resolve_k(_split_wrapped(y))
    return _tail(r, cb)


def _tighten_s17(x):
    """_tighten for x whose limbs are ALREADY <= 2^17 - 2 (e.g. the raw
    sum of two strict values): skips the split pass.  value < 2^257
    => wrapped value < 2^256 + 2^34, tail precondition holds."""
    r, cb = _resolve_k(x)
    y = _wrap(r, cb)
    r2, cb2 = _resolve_k(_split_wrapped(y))
    return _tail(r2, cb2)


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


def _add_f16(a, b):
    """a + b mod p -> strict f16.  a, b: any 16-row forms with limbs
    < 2^26 (strict / w16 / mul_small products) and values < 2^271."""
    return _tighten(a + b)


def _sub_f16(kc, a, b):
    """a - b mod p -> strict f16.  a: limbs < 2^26, value < 2^257 (w16
    or strict); b: limbs <= W_COMP (strict / w16 / raw sum of two w16 /
    small multiples of strict — all < 2^23).  Complement identity (see
    _kc): operand limbs < 2^26 + 2^26 + 2^16 (uint32-safe), value
    < a + W_COMP*S16 + p < 2^268 < 2^272 (_tighten's window)."""
    return _tighten(a + (jnp.uint32(W_COMP) - b) + kc)


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


def _mul_lazy(a, b):
    """(16, BL) strict x strict -> a*b as 16 LAZY rows: limbs
    < 2*979*2^21 < 2^32, value < 2^266.  Partial products as 16-row
    planes at limb offsets 0..16: 16 broadcast multiplies, no 3-D
    tensors.  Step i combines lo_i with the previous step's hi (both
    land at offset i, rows < 2^17); the 17 planes are then summed by a
    balanced offset-merge tree (_merge_off) in which only overlapping
    rows pay adds -- ~2.4k element-ops/lane versus ~8.2k for the
    sequential 32-row padded-accumulator form (the columns are the same
    terms in a different association order, all partial sums bounded by
    the final column sums < 16 * 2^17 = 2^21).  BOTH reduction folds
    stack lazily.  Consumers finish with _carry_wrap (additive
    consumers) or _tighten (mul inputs / kernel outputs) -- the r2
    dropped-carry lesson lives there: the lazy value reaches ~2^266, so
    a single resolve leaves a remainder that is NOT provably small;
    only _tighten's second resolve makes the 6-limb tail exact."""
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
    return _lazy_fold(_lazy_fold(acc))


def _mul_w16(a, b):
    """strict x strict -> w16 product (ONE resolve; the lazy top limb
    x[15] < 2^26 since the value < 2^266, so w < 2^11 and the w16 limbs
    stay < 2^21).  Use when every consumer is additive."""
    return _carry_wrap(_mul_lazy(a, b))


def _mul_f16(a, b):
    """strict x strict -> strict product (feeds another mul or leaves
    the kernel)."""
    return _tighten(_mul_lazy(a, b))


def _mul_small_w16(a, k: int):
    """a * k -> w16 for a small host constant 1 <= k <= 32; a strict or
    w16 (limbs < 2^26, so products < 2^31 are uint32-exact; value
    < 32 * 2^257 < 2^262)."""
    assert 1 <= k <= 32, k
    return _carry_wrap(a * jnp.uint32(k))


def _mul_small_f16(a, k: int):
    """a * k -> strict f16 (same operand bounds as _mul_small_w16)."""
    assert 1 <= k <= 32, k
    return _tighten(a * jnp.uint32(k))


def _padd_body(kc, x1, y1, z1, x2, y2, z2):
    """RCB complete addition (same algebra as ops.curve.padd).  Inputs
    and outputs are strict f16.

    Form discipline (module docstring): every product is ONE _mul_lazy;
    products whose consumers are all additive finish with a single
    wrapped carry (w16: t0, t1, t2 and the six x3/y3/z3-assembly
    products), while products and sums feeding another multiplication
    finish with _tighten (strict).  Subtrahend limb bounds at each
    _sub_f16 call: t0+t1 etc are raw sums of two w16 (< 2^22 <= W_COMP),
    t2b is w16 (< 2^17: its wrap excess is <= 22), the x3 subtrahend is
    w16 (< 2^21)."""
    mw = _mul_w16
    af = _tighten_s17  # strict + strict input adds (limbs <= 2^17 - 2)
    t0 = mw(x1, x2)
    t1 = mw(y1, y2)
    t2 = mw(z1, z2)
    t3 = _sub_f16(kc, mw(af(x1 + y1), af(x2 + y2)), t0 + t1)
    t4 = _sub_f16(kc, mw(af(y1 + z1), af(y2 + z2)), t1 + t2)
    t5 = _sub_f16(kc, mw(af(x1 + z1), af(x2 + z2)), t0 + t2)
    t0_3 = _mul_small_f16(t0, 3)
    t2b = _mul_small_w16(t2, B3)
    z3t = _tighten(t1 + t2b)  # w16 + w16: limbs < 2^22, value < 2^262
    t1m = _sub_f16(kc, t1, t2b)
    y3b = _mul_small_f16(t5, B3)
    x3 = _sub_f16(kc, mw(t3, t1m), mw(t4, y3b))
    y3 = _tighten(mw(y3b, t0_3) + mw(t1m, z3t))
    z3 = _tighten(mw(z3t, t4) + mw(t0_3, t3))
    return x3, y3, z3


def _pdbl_body(kc, x, y, z):
    """RCB complete doubling (same algebra as ops.curve.pdbl; the 8x,
    21x and 3x multiples run as single mul_smalls).  Form discipline as
    in _padd_body: w16 for additive-consumed products, strict for mul
    inputs (z3, t1, t2, y3a, t0s, x*y) and for kernel outputs."""
    t0 = _mul_w16(y, y)
    z3 = _mul_small_f16(t0, 8)
    t1 = _mul_f16(y, z)
    t2 = _mul_small_f16(_mul_w16(z, z), B3)
    x3 = _mul_w16(t2, z3)
    y3a = _tighten(t0 + t2)  # w16 + strict
    z3o = _mul_f16(t1, z3)
    # subtrahend 3*t2: strict * 3 < 2^18 <= W_COMP, raw (no carry needed)
    t0s = _sub_f16(kc, t0, t2 * jnp.uint32(3))
    y3 = _tighten(x3 + _mul_w16(t0s, y3a))  # w16 + w16
    u = _mul_w16(t0s, _mul_f16(x, y))
    x3o = _tighten(u + u)  # 2*(t0s*(x*y)); w16 + w16
    return x3o, y3, z3o


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
    kspec = pl.BlockSpec((NLIMB, 1), lambda i: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM)
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
    entries = [(zero, one, zero), (bx, by, bz)]
    acc = (bx, by, bz)
    for _ in range(7):
        acc = _padd_body(k2v, *acc, bx, by, bz)
        entries.append(acc)
    ox[:] = jnp.concatenate([e[0] for e in entries], axis=0)
    oz[:] = jnp.concatenate([e[2] for e in entries], axis=0)
    ys = [e[1] for e in entries]
    nys = [_sub_f16(k2v, zero, y) for y in ys]
    oy[:] = jnp.concatenate(ys + nys, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def table_flat_pallas(px, py, pz, interpret: bool = False):
    """(16, L) projective base lanes -> flat tables (144, L), (288, L),
    (144, L) for select_reduce_pallas.  L must be a multiple of 1024."""
    L = px.shape[-1]
    assert L % 1024 == 0
    ms = pl.ANY if interpret else pltpu.VMEM
    spec = pl.BlockSpec((NLIMB, 1024), lambda i: (0, i), memory_space=ms)
    kspec = pl.BlockSpec((NLIMB, 1), lambda i: (0, 0), memory_space=ms)
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
        entries = [(zero, one, zero), (bx, by, bz)]
        acc = (bx, by, bz)
        for _ in range(7):
            acc = _padd_body(k2v, *acc, bx, by, bz)
            entries.append(acc)
        tx[:] = jnp.concatenate([e[0] for e in entries], axis=0)
        tz[:] = jnp.concatenate([e[2] for e in entries], axis=0)
        ys = [e[1] for e in entries]
        nys = [_sub_f16(k2v, zero, y) for y in ys]
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
    kspec = pl.BlockSpec((NLIMB, 1), lambda i, r: (0, 0), memory_space=ms)
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
    kspec = pl.BlockSpec((NLIMB, 1), lambda i, r: (0, 0), memory_space=ms)
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
    kspec = pl.BlockSpec((NLIMB, 1), lambda i: (0, 0), memory_space=pl.ANY if interpret else pltpu.VMEM)
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
