"""On-chip phase profile of the fused complete-add kernel (round 3).

Measures each sub-phase of pallas_field._padd_body as its own chained
Pallas kernel (field mul, field add, lazy sub, mul_small, carry, raw
product formation) and compares against the traced instruction-stream
bound from opcount at the measured VPU rates.  The output attributes the
measured 12.4 ns/lane-padd to phases so optimization goes where the time
is, not where the hand-model guessed (VERDICT r2 item 1 methodology).

Run standalone on the real TPU (single-tenant: never concurrently with
bench.py).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bulletproofspp_tpu.ops import limb
from bulletproofspp_tpu.ops import pallas_field as pf
from bulletproofspp_tpu import opcount

L = 65536
REP = 8
NLIMB = pf.NLIMB


def _chain_kernel(body, nout, k2, a, b, *outs):
    """Generic REP-chained phase kernel: x <- body(k2, x, b) REP times."""
    k2v = k2[:]
    x = tuple(t[:] for t in a)
    bv = tuple(t[:] for t in b)
    for _ in range(REP):
        x = body(k2v, x, bv)
    for o, t in zip(outs, x[:nout]):
        o[:] = t


def make_chain(body, nout=1, block=512):
    @functools.partial(jax.jit, static_argnames=())
    def run(a, b):
        spec = pl.BlockSpec((NLIMB, block), lambda i: (0, i), memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((NLIMB, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        out = jax.ShapeDtypeStruct((NLIMB, L), jnp.uint32)
        k2 = jnp.asarray(pf._kc())
        return pl.pallas_call(
            functools.partial(_chain_kernel, body, nout),
            grid=(L // block,),
            in_specs=[kspec] + [spec] * (len(a) + len(b)),
            out_specs=tuple([spec] * nout),
            out_shape=tuple([out] * nout),
        )(k2, *a, *b)

    return run


# --- phase bodies (x is a tuple of planes; keep a serial dependency) ----
def body_mul(k2, x, b):
    return (pf._mul_f16(x[0], b[0]),)


def body_mul_w16(k2, x, b):
    # chainable strict proxy for the w16 product (mask rows 0/2 back to
    # strict so the next iteration's operands stay in-contract)
    return (pf._mul_w16(x[0], b[0]) & pf.MASK,)


def body_add(k2, x, b):
    return (pf._add_f16(x[0], b[0]),)


def body_add_s17(k2, x, b):
    return (pf._tighten_s17(x[0] + b[0]),)


def body_sub(k2, x, b):
    return (pf._sub_f16(k2, x[0], b[0]),)


def body_sub_raw2(k2, x, b):
    return (pf._sub_f16(k2, x[0], b[0] + b[0]),)


def body_mul_small(k2, x, b):
    return (pf._mul_small_f16(x[0], 3),)


def body_carry(k2, x, b):
    # feed limbs ~2^17 so the full split pass runs
    return (pf._carry(x[0] + x[0] + b[0])[:NLIMB],)


def body_prodform(k2, x, b):
    """Raw 16x16 product formation + both lazy folds, NO carries: the
    accumulation portion of _mul in isolation (output folded to 16 rows
    masked to keep a serial dependency without correctness semantics)."""
    a = x[0]
    bb = b[0]
    bl = a.shape[-1]
    acc = jnp.zeros((2 * NLIMB, bl), jnp.uint32)
    hi_prev = None
    for i in range(NLIMB):
        prod = a[i : i + 1, :] * bb
        lo = prod & pf.MASK
        hi = prod >> 16
        blk = lo if hi_prev is None else lo + hi_prev
        acc = acc + pf._pad_rows(blk, i, NLIMB - i)
        hi_prev = hi
    acc = acc + pf._pad_rows(hi_prev, NLIMB, 0)
    t = pf._lazy_fold(pf._lazy_fold(acc))
    return (t[:NLIMB] & pf.MASK,)


def body_padd(k2, x, b):
    return pf._padd_body(k2, *x, *b)


PHASES = [
    # (name, body, n state planes, count in one padd): the w16 padd body
    # is 12 mul_w16 + 5 sub_f16 + 3 tighten-adds + 6 s17-adds
    # + 2 mul_small_f16 + 1 mul_small_w16 (~= mul_small_f16)
    ("padd", body_padd, 3, 1.0),
    ("mul_w16", body_mul_w16, 1, 12.0),
    ("mul_f16", body_mul, 1, None),
    ("mul_small", body_mul_small, 1, 3.0),
    ("add", body_add, 1, 3.0),
    ("add_s17", body_add_s17, 1, 6.0),
    ("sub", body_sub, 1, 5.0),
    ("sub_raw2", body_sub_raw2, 1, None),
    ("carry_full", body_carry, 1, None),
    ("prod_form", body_prodform, 1, None),
]


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def best(fn, *a, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def counts_for(body, nstate):
    k2 = jnp.zeros((NLIMB, 1), jnp.uint32)
    planes = [jnp.zeros((NLIMB, 256), jnp.uint32) for _ in range(nstate + 3)]

    def f(k2, *ps):
        return body(k2, tuple(ps[:nstate]), tuple(ps[nstate:]))

    return opcount.count_fn(f, k2, *planes, per_lane_axis_size=256)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(5)
    mk = lambda: jnp.asarray(rng.integers(0, 2**16, size=(NLIMB, L), dtype=np.uint32))
    t_null = best(jax.jit(lambda x: x + 1), jnp.zeros((1,), jnp.uint32))
    print(f"null RTT {t_null*1e3:.2f} ms", flush=True)

    # measured VPU rates (same methodology as bench.roofline)
    import bench

    r_mul = bench._measure_rate(lambda p, q, c: p * q + c, 2)
    r_add = bench._measure_rate(lambda p, q, c: (p + q) ^ c, 2)
    print(f"r_mul {r_mul/1e12:.2f} Top/s  r_add {r_add/1e12:.2f} Top/s", flush=True)

    results = {}
    for name, body, nstate, mult in PHASES:
        run = make_chain(body, nout=1)
        a = tuple(mk() for _ in range(nstate))
        b = tuple(mk() for _ in range(3))
        t0 = time.perf_counter()
        sync(run(a, b))
        print(f"{name}: compiled in {time.perf_counter()-t0:.1f}s", flush=True)
        t = (best(run, a, b) - t_null) / REP / L
        c = counts_for(body, nstate)
        mul = c.get("mul", 0.0)
        other = c.get("elem", 0.0) + c.get("copy", 0.0)
        bound = mul / r_mul + other / r_add
        results[name] = (t, bound, c)
        print(
            f"{name:12s} {t*1e9:7.2f} ns/lane   bound {bound*1e9:6.2f}  "
            f"util {bound/t:4.2f}   ops: mul {mul:.0f} elem {c.get('elem',0):.0f} "
            f"copy {c.get('copy',0):.0f}",
            flush=True,
        )

    # attribution: sum of phase times x multiplicity vs whole padd
    tot = sum(results[n][0] * m for n, _, _, m in PHASES if m and n != "padd")
    print(
        f"\nsum(phases x multiplicity) {tot*1e9:.2f} ns vs padd "
        f"{results['padd'][0]*1e9:.2f} ns  (gap = cross-phase scheduling)",
        flush=True,
    )


if __name__ == "__main__":
    main()
