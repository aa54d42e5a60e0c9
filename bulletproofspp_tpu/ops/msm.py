"""Vectorized multi-scalar multiplication kernels.

Re-design of the reference's row-serial Straus MSM
(reference: src/Commitment.hs:311-398 ``FastInnerProduct.innerProduct``)
for the TPU execution model:

  * scalars are GLV-split on host (ops.glv) into two ~sqrt(n) halves, so a
    k*P lane becomes two lanes (P, phi(P)) — same trick as the reference's
    129-row Eisenstein digit MSM, but with 4-bit signed digits and 33 rows;
  * per lane, a 9-entry multiple table [0P..8P] is built with 7 batched
    complete additions (ops.curve.padd — branchless, identity-safe);
  * digit selection is ONE-HOT masked accumulation (TPU gathers execute
    on the scalar unit and dominate at scale); signs select from a
    pre-negated table (no data-dependent control flow anywhere);
  * the row×lane selected points are tree-reduced over lanes (log2 L
    batched adds — the per-row reduction the reference does serially), and
    the 33 row sums are Horner-combined in a single fused Pallas kernel
    (falling back to ``lax.scan`` off-TPU).

Work: ~L*(33 + 8) complete adds per MSM of L lanes — Pippenger-class for
the proof-sized MSMs here, with zero data-dependent shapes.

``fold_mul_kernel`` covers both per-round basis folding b*G_even + a*G_odd
(reference: src/Commitment.hs:343-353 ``projectivePairIP``) and shared
scalar multiplication (square-completion transform, reference:
src/Bulletproof/InnerProductArgument.hs:194-206): both are "two shared
digit streams against two per-lane tables".
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import limb, curve
from .glv import ROWS

U32 = jnp.uint32


# Above this lane count the flat multiple tables ((144+288+144, L) u32 =
# ~2.3 KB/lane of HBM) approach v5e HBM capacity (~9.4 GB at 4M lanes on
# top of the ~4 GB of inputs/partials); the VMEM-scratch select variant
# (table built per lane block inside the kernel, never materialized in
# HBM) is ~5% slower at small L (measured, BENCH_NOTES) but removes the
# table's HBM footprint entirely.  Static threshold — chosen once here,
# not via env var, so every call site compiles the same choice
# (a trace-time env read would be silently frozen by the jit cache).
_SCRATCH_TABLE_MIN_L = 1 << 21


def _table(px, py, pz):
    """Projective lanes (16, L) -> multiple tables (16, 9, L) for 0P..8P,
    plus the Y table extended with negated entries: (16, 18, L).

    Bases are PROJECTIVE (complete formulas never need affine inputs), so
    identity lanes (0:1:0) are valid pad/None encodings.  The 7 chained
    additions run under ``lax.scan`` so the complete-add body lowers ONCE
    (compile time on the XLA CPU backend scales with the number of
    inlined point ops, so every repeated op here is a scan)."""
    one = limb.ones(px.shape[1:])
    zero = limb.zeros(px.shape[1:])
    base = (px, py, pz)
    ident = (zero, one, zero)

    def step(acc, _):
        nxt = curve.padd_auto(acc, base)
        return nxt, nxt

    _, mults = lax.scan(step, base, None, length=7)  # (7, 16, L) per coord
    tx = jnp.concatenate([jnp.stack([ident[0], base[0]], 1), jnp.moveaxis(mults[0], 0, 1)], axis=1)
    ty = jnp.concatenate([jnp.stack([ident[1], base[1]], 1), jnp.moveaxis(mults[1], 0, 1)], axis=1)
    tz = jnp.concatenate([jnp.stack([ident[2], base[2]], 1), jnp.moveaxis(mults[2], 0, 1)], axis=1)
    ty2 = jnp.concatenate([ty, limb.sub(jnp.zeros_like(ty), ty)], axis=1)  # (16, 18, L)
    return tx, ty2, tz


def _reduce_lanes(sel, width):
    """Tree-reduce points over the last axis, work-optimal (width-1 adds)
    with few distinct lowerings: radix-8 levels fold 8 lanes with 7
    complete adds that all share ONE shape (so the jitted padd lowers once
    per level), giving ceil(log2(width)/3) lowerings instead of log2.
    Returns the reduced tuple with last axis 1."""
    assert width & (width - 1) == 0, "lane count must be a power of two"
    while width > 1:
        radix = 8 if width % 8 == 0 else (4 if width % 4 == 0 else 2)
        groups = width // radix
        resh = tuple(t.reshape(*t.shape[:-1], groups, radix) for t in sel)
        parts = [tuple(t[..., i] for t in resh) for i in range(radix)]
        while len(parts) > 1:
            parts = [curve.padd_auto(parts[i], parts[i + 1]) for i in range(0, len(parts), 2)]
        sel = parts[0]
        width = groups
    return sel


def _dbl4(acc):
    """Four doublings as a scan (single pdbl lowering)."""
    return lax.scan(lambda a, _: (curve.pdbl(a), None), acc, None, length=4)[0]


def msm_kernel(px, py, pz, absd, sgn):
    """sum_i s_i * P_i over L lanes.

    px, py, pz: (16, L) projective lanes (GLV halves pre-expanded by the
    caller; identity lanes encode None/padding).
    absd, sgn: (ROWS, L) uint32 digit magnitudes [0..8] and signs {0,1}.
    Returns a single projective point as (16, 1) limb planes per coord.
    """
    L = px.shape[-1]
    rows = absd.shape[0]

    if curve._pallas_enabled() and L >= 1024 and (L & (L - 1)) == 0:
        # large MSMs: table -> flat layout, then the fused Pallas
        # select+reduce kernel (digit selection never round-trips HBM),
        # the 8:1 reduce chain, and the fused tail+Horner — ~5 launches
        # total, each at the fused-padd compute rate
        from . import pallas_field

        if L >= _SCRATCH_TABLE_MIN_L:
            # HBM-capacity regime: single-kernel variant, table lives
            # only in VMEM scratch (built once per lane block at the
            # r==0 program; the 8x-longer build programs bubble the
            # block pipeline ~5%, measured, but the (576, L) table
            # never exists in HBM)
            flat = pallas_field.select_reduce_fused_pallas(px, py, pz, absd, sgn)
        else:
            fx, fy2, fz = pallas_field.table_flat_pallas(px, py, pz)
            flat = pallas_field.select_reduce_pallas(fx, fy2, fz, absd, sgn)
        W = L // 8
        while W > 128:
            f = min(8, W // 128)
            flat = pallas_field.reduce_block_pallas(flat, factor=f)
            W //= f
        return pallas_field.tail_horner_pallas(flat, rows)

    tx, ty2, tz = _table(px, py, pz)

    # digit selection as ONE-HOT masked accumulation, not a gather: TPU
    # gathers run on the scalar unit and dominate the whole MSM at scale;
    # 9 (resp. 18 signed) full-width masked adds are pure VPU work
    def onehot_select(table, idx):
        n_entries = table.shape[1]
        acc = jnp.zeros((limb.NLIMB, rows, L), U32)
        for k in range(n_entries):
            mask = (idx == k)[None]  # (1, ROWS, L)
            acc = acc + jnp.where(mask, table[:, k, None, :], jnp.uint32(0))
        return acc

    idxy = absd + 9 * sgn
    selx = onehot_select(tx, absd)  # (16, ROWS, L)
    sely = onehot_select(ty2, idxy)
    selz = onehot_select(tz, absd)

    if curve._pallas_enabled() and L >= 128 and (L & (L - 1)) == 0:
        # fused Pallas reduction: each launch narrows the row-major
        # (16, ROWS*L) planes 8:1 with in-VMEM halving adds (no wasted
        # lanes, no per-level pad/reshape traffic), then ONE launch
        # roll-reduces the last 128 lanes/row and runs the full Horner —
        # 4 launches for a 65536-lane MSM instead of ~20 padd dispatches
        from . import pallas_field

        flat = tuple(t.reshape(limb.NLIMB, rows * L) for t in (selx, sely, selz))
        W = L
        while W > 128:
            f = min(8, W // 128)
            flat = pallas_field.reduce_block_pallas(flat, factor=f)
            W //= f
        return pallas_field.tail_horner_pallas(flat, rows)

    # tree-reduce over lanes (the reference's per-row serial adds,
    # reference: Commitment.hs:331-335, become log2(L) batched adds)
    sel = _reduce_lanes((selx, sely, selz), L)

    if curve._pallas_enabled():
        # ONE fused kernel for the whole 33-row accumulation (otherwise
        # ~165 width-1 point ops of pure dispatch latency)
        from . import pallas_field

        rx, ry, rz = (t[..., 0] for t in sel)  # (16, ROWS)
        return pallas_field.horner_pallas(rx, ry, rz)

    rows = tuple(jnp.moveaxis(t[..., :1], 1, 0) for t in sel)  # (ROWS, 16, 1)

    def horner(acc, row):
        return curve.padd(_dbl4(acc), row), None

    # identity derived from the inputs so its sharding/varying-axes type
    # matches the scan body output under shard_map
    zero = jnp.zeros_like(rows[0][0])
    init = (zero, zero.at[0].set(1), zero)
    acc, _ = lax.scan(horner, init, rows)
    return acc


def precompute_flat_table(px, py, pz):
    """Flat multiple tables for a FIXED basis, to be cached across MSM
    calls: (144, L), (288, L), (144, L) device arrays (9 x/z entries,
    18 signed y entries; ~2.3 KB/lane of HBM).

    The basis of a setup never changes (reference: the deterministic
    getPoints stream, app/Main.hs:68-72 — the engine already caches the
    packed basis per setup), so its 0P..8P tables are pure
    precomputation: caching them removes the 7 table-build adds from
    every subsequent MSM's 40 adds/lane (-17% of the hot path).  Only
    valid on the Pallas path (L a multiple of 1024)."""
    from . import pallas_field

    return pallas_field.table_flat_pallas(px, py, pz)


@jax.jit
def msm_tabled_kernel(fx, fy2, fz, absd, sgn):
    """``msm_kernel`` with the table build hoisted out (see
    ``precompute_flat_table``): select+reduce, the 8:1 reduce chain, and
    the fused tail+Horner — 33 complete adds per lane instead of 40."""
    from . import pallas_field

    rows, L = absd.shape
    flat = pallas_field.select_reduce_pallas(fx, fy2, fz, absd, sgn)
    W = L // 8
    while W > 128:
        f = min(8, W // 128)
        flat = pallas_field.reduce_block_pallas(flat, factor=f)
        W //= f
    return pallas_field.tail_horner_pallas(flat, rows)


def tabled_supported(L: int) -> bool:
    """The tabled path needs the Pallas kernels and their lane layout —
    and must stay OUT of the HBM-capacity regime: at >= _SCRATCH_TABLE_MIN_L
    lanes the (576, L) flat table is the multi-GB footprint the
    VMEM-scratch kernel variant exists to avoid (msm_kernel's own branch
    above), so a cached table would OOM exactly where production
    switches away from it."""
    return (
        curve._pallas_enabled()
        and 1024 <= L < _SCRATCH_TABLE_MIN_L
        and (L & (L - 1)) == 0
        and L % 1024 == 0
    )


def fold_mul_kernel(pex, pey, pez, pox, poy, poz, de, se, do, so):
    """Per-lane b*E_i + a*O_i with SHARED digit streams.

    pex/pey/pez, pox/poy/poz: (16, L) projective lanes for the two bases
    (identity encodes a None base, whose contribution is the identity).
    de, se: (ROWS,) digits/signs of the scalar multiplying E lanes;
    do, so: same for O lanes.  Returns projective (16, L) coords.

    Covers basis folding (reference: src/Commitment.hs:343-353) and, with
    O = phi(E), shared scalar mult k*P via GLV halves.
    """
    tex, tey2, tez = _table(pex, pey, pez)
    tox, toy2, toz = _table(pox, poy, poz)

    def body(acc, row):
        d_e, s_e, d_o, s_o = row
        acc = _dbl4(acc)
        pe = (
            lax.dynamic_index_in_dim(tex, d_e, axis=1, keepdims=False),
            lax.dynamic_index_in_dim(tey2, d_e + 9 * s_e, axis=1, keepdims=False),
            lax.dynamic_index_in_dim(tez, d_e, axis=1, keepdims=False),
        )
        po = (
            lax.dynamic_index_in_dim(tox, d_o, axis=1, keepdims=False),
            lax.dynamic_index_in_dim(toy2, d_o + 9 * s_o, axis=1, keepdims=False),
            lax.dynamic_index_in_dim(toz, d_o, axis=1, keepdims=False),
        )
        return curve.padd(curve.padd(acc, pe), po), None

    xs = (de.astype(jnp.int32), se.astype(jnp.int32), do.astype(jnp.int32), so.astype(jnp.int32))
    zero = jnp.zeros_like(pex)
    init = (zero, zero.at[0].set(1), zero)  # input-derived: shard_map-safe
    acc, _ = lax.scan(body, init, xs)
    return acc


def complete_square_kernel(g0x, g0y, g0z, e0x, e0y, e0z, g1x, g1y, g1z, de, se, do, so):
    """(g1 + r*g0, g1 - r*g0) lanes where r*g0 is evaluated via GLV halves
    (g0, phi(g0)) with shared digit streams (reference:
    src/Bulletproof/InnerProductArgument.hs:194-206 square completion)."""
    rp = fold_mul_kernel(g0x, g0y, g0z, e0x, e0y, e0z, de, se, do, so)
    g1 = (g1x, g1y, g1z)
    gx = curve.padd(g1, rp)
    hy = curve.padd(g1, curve.pneg(rp))
    return gx + hy


_msm_compiled = jax.jit(msm_kernel)
_msm_pair_compiled = jax.jit(jax.vmap(msm_kernel))
_fold_compiled = jax.jit(fold_mul_kernel)
_fold_many_compiled = jax.jit(jax.vmap(fold_mul_kernel))
_csq_compiled = jax.jit(complete_square_kernel)


def _csq_with_endo(g0x, g0y, g0z, g1x, g1y, g1z, de, se, do, so):
    ex, ey, ez = curve.endo((g0x, g0y, g0z))
    return complete_square_kernel(g0x, g0y, g0z, ex, ey, ez, g1x, g1y, g1z, de, se, do, so)


_csq_many_compiled = jax.jit(jax.vmap(_csq_with_endo))


def run_msm(px, py, pz, absd, sgn):
    return _msm_compiled(px, py, pz, absd, sgn)


def run_fold(pex, pey, pez, pox, poy, poz, de, se, do, so):
    """fold_mul then batched normalize to affine lanes on device."""
    acc = _fold_compiled(pex, pey, pez, pox, poy, poz, de, se, do, so)
    return _to_affine_compiled(acc)


@jax.jit
def _to_affine_compiled(acc):
    return curve.to_affine(acc)
