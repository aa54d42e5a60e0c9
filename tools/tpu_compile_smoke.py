"""On-device compile + correctness smoke for every production Pallas path.

Runs each kernel at a small shape on the REAL chip (not interpret mode)
and checks the result against the exact host-integer engine.  This is
the fast iteration loop for Mosaic lowering regressions (the full bench
takes minutes to hit the same compile).
"""

import os
import sys
import time

# repo root on sys.path WITHOUT PYTHONPATH: an inherited PYTHONPATH
# containing the repo breaks the axon jax-plugin discovery (backend
# 'axon' vanishes from the known-backends list), while a plain path
# insert does not.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bulletproofspp_tpu.core import ec
    from bulletproofspp_tpu.core.fields import R
    from bulletproofspp_tpu.ops import curve, glv, limb, msm
    from bulletproofspp_tpu.ops import pallas_field as pf
    from bulletproofspp_tpu.ops.engine import _interleave_endo
    from bulletproofspp_tpu import native

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(7)

    def recode(svals):
        nat = native.glv_recode_batch(svals)
        if nat is None:
            halves = []
            for s in svals:
                k1, k2 = glv.split(s)
                halves += [k1, k2]
            nat = glv.recode_batch(halves)
        return nat

    def rand_points(n):
        ks = [int(rng.integers(1, 1 << 60)) for _ in range(n)]
        pts = [ec.scalar_mul(k, ec.G) for k in ks]
        px = np.stack([limb.pack_int(p[0]) for p in pts], axis=-1)
        py = np.stack([limb.pack_int(p[1]) for p in pts], axis=-1)
        pz = np.stack([limb.pack_int(1) for _ in pts], axis=-1)
        return pts, px, py, pz

    def host_msm(scalars, pts):
        acc = None
        for s, p in zip(scalars, pts):
            t = ec.scalar_mul(s % R, p)
            acc = t if acc is None else ec.add(acc, t)
        return acc

    n = 512  # GLV-expands to L = 1024 lanes -> the Pallas pipeline path
    pts, px, py, pz = rand_points(n)
    scalars = [int.from_bytes(rng.bytes(32)) % (R - 1) + 1 for _ in range(n)]
    want = host_msm(scalars, pts)

    px2, py2, pz2 = (np.asarray(t) for t in _interleave_endo(jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz)))
    absd, sgn = recode(scalars)

    def check(tag, fn):
        t0 = time.time()
        try:
            out = fn()
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()
            print(f"FAIL {tag}: {msg[0] if msg else e!r}", flush=True)
            for line in msg[1:12]:
                print("   ", line, flush=True)
            return False
        got = ec.to_affine(tuple(int(limb.unpack_int(np.asarray(c)[:, 0])) for c in out))
        ok = got == want
        print(f"{'ok  ' if ok else 'MISMATCH'} {tag}  ({time.time() - t0:.1f}s)", flush=True)
        return ok

    ok = True
    # 1. production dispatch (table_flat + select_reduce + reduce_block + tail_horner)
    ok &= check("msm pipeline L=1024", lambda: msm.run_msm(px2, py2, pz2, absd, sgn))

    # 2. scratch-table single-kernel variant (production at L >= 2^21; compile it small)
    def scratch():
        flat = pf.select_reduce_fused_pallas(
            jnp.asarray(px2), jnp.asarray(py2), jnp.asarray(pz2), jnp.asarray(absd), jnp.asarray(sgn)
        )
        W = px2.shape[-1] // 8
        rows = absd.shape[0]
        while W > 128:
            f = min(8, W // 128)
            flat = pf.reduce_block_pallas(flat, factor=f)
            W //= f
        return pf.tail_horner_pallas(flat, rows)

    ok &= check("msm scratch-table L=1024", scratch)

    # 3. small-shape path (XLA table + padd_pallas folds) via a sub-1024 call
    pts3, px3, py3, pz3 = rand_points(96)
    sc3 = [int.from_bytes(rng.bytes(32)) % (R - 1) + 1 for _ in range(96)]
    want3 = host_msm(sc3, pts3)
    px3i, py3i, pz3i = (np.asarray(t) for t in _interleave_endo(jnp.asarray(px3), jnp.asarray(py3), jnp.asarray(pz3)))
    a3, s3 = recode(sc3)

    def small():
        return msm.run_msm(px3i, py3i, pz3i, a3, s3)

    saved_want = want
    want = want3  # noqa: F841  (check closes over `want`)

    t0 = time.time()
    try:
        out = small()
        got = ec.to_affine(tuple(int(limb.unpack_int(np.asarray(c)[:, 0])) for c in out))
        okk = got == want3
        print(f"{'ok  ' if okk else 'MISMATCH'} msm small L=192  ({time.time() - t0:.1f}s)", flush=True)
        ok &= okk
    except Exception as e:  # noqa: BLE001
        print(f"FAIL msm small: {str(e).splitlines()[0]}", flush=True)
        ok = False
    want = saved_want

    print("SMOKE", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
