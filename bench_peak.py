"""Empirical VPU u32 speed-of-light + padd variants on the real TPU.

Deep op chains (512+ ops/element) so compute time >> tunnel RTT.
"""

import os
import time

import numpy as np

os.environ.setdefault("BPPP_ENGINE", "jax")

import jax
import jax.numpy as jnp

from bulletproofspp_tpu.ops import limb, curve
from bulletproofspp_tpu.core import ec

L = int(os.environ.get("PROF_L", "65536"))
DEPTH = int(os.environ.get("PROF_DEPTH", "512"))


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(name, fn, *args, iters=3):
    fn(*args)
    sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), name


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(16, L), dtype=np.uint32))
    b = jnp.asarray(rng.integers(1, 1 << 16, size=(16, L), dtype=np.uint32))
    n_elem = 16 * L

    z = jnp.zeros((1,), jnp.uint32)
    t_null, _ = timeit("null", lambda x: x + 1, z)
    print(f"null RTT {t_null*1e3:.2f} ms; elems {n_elem/1e6:.2f}M; depth {DEPTH}")

    def chain(op):
        @jax.jit
        def f(x, y):
            acc = x
            for _ in range(DEPTH):
                acc = op(acc, y)
            return acc
        return f

    for name, op, opcount in [
        ("add", lambda x, y: x + y, 1),
        ("mul", lambda x, y: x * y, 1),
        ("mad (mul+add)", lambda x, y: x * y + x, 2),
        ("and", lambda x, y: x & y, 1),
        ("shift", lambda x, y: (x >> 3) | y, 2),
        ("where(eq)", lambda x, y: jnp.where(x == y, x + 1, y), 2),
    ]:
        t, _ = timeit(name, chain(op), a, b)
        g = DEPTH * opcount * n_elem / max(t - t_null, 1e-9) / 1e9
        print(f"u32 {name:14s} {(t-t_null)*1e3:8.2f} ms  {g:8.1f} Gop/s")

    # f32 comparison (VPU native rate)
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    t, _ = timeit("f32 fma", chain(lambda x, y: x * y + x), af, bf)
    print(f"f32 fma            {(t-t_null)*1e3:8.2f} ms  {DEPTH*2*n_elem/max(t-t_null,1e-9)/1e9:8.1f} Gop/s")

    # padd variants at (16, L): XLA vs pallas
    px, py, pz = curve.from_affine_host([ec.G] * 4)
    P = tuple(jnp.tile(t, (1, L // 4)) for t in (px, py, pz))

    def rep(fn, n):
        @jax.jit
        def f(p):
            for _ in range(n):
                p = fn(p, p)
            return p
        return f

    REP = 8
    t, _ = timeit("padd xla x8", rep(curve.padd, REP), P)
    print(f"padd XLA     {(t-t_null)/REP*1e3:8.2f} ms/padd at {L} lanes "
          f"({(t-t_null)/REP/L*1e9:6.1f} ns/lane-padd)")
    t, _ = timeit("padd auto(pallas) x8", rep(curve.padd_auto, REP), P)
    print(f"padd PALLAS  {(t-t_null)/REP*1e3:8.2f} ms/padd at {L} lanes "
          f"({(t-t_null)/REP/L*1e9:6.1f} ns/lane-padd)")

    def repmul(n):
        @jax.jit
        def f(x, y):
            for _ in range(n):
                x = limb.mul(x, y)
            return x
        return f

    t, _ = timeit("limb.mul x16", repmul(16), a, b)
    per = (t - t_null) / 16
    print(f"limb.mul     {per*1e3:8.3f} ms/mul at {L} lanes ({per/L*1e9:6.1f} ns/lane-mul)")


if __name__ == "__main__":
    main()
