"""Block-width sweep of the fused-padd chain rate.

BENCH_NOTES attributes the kernel's residual gap to its 9.6-10 ns/lane
vs the ~6 ns VPU issue bound (dependency-chain latency; more ILP needs
wider blocks, wider blocks need more VMEM).  This sweep measures the
chain rate at every block width the kernel accepts, deep enough
(REP*L >= 25 ms of signal) to be above tunnel jitter — the round-5
measurement-honesty methodology.

Usage: python tools/padd_block_sweep.py   (on the TPU)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from bulletproofspp_tpu.core import ec
from bulletproofspp_tpu.ops import curve
from bulletproofspp_tpu.ops.pallas_field import padd_pallas

print("devices:", jax.devices(), flush=True)
L = 65536
REP = 32
px0, py0, pz0 = curve.from_affine_host([ec.G])
P = tuple(jnp.tile(t, (1, L)) for t in (px0, py0, pz0))


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def best(fn, *a, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


t_null = best(jax.jit(lambda x: x + 1), jnp.zeros((1,), jnp.uint32))
print(f"null {t_null*1e3:.2f} ms", flush=True)

for block in (128, 256, 512, 1024, 2048):
    try:
        @jax.jit
        def chain(p, block=block):
            for _ in range(REP):
                p = padd_pallas(p, p, block=block)
            return p

        t0 = time.perf_counter()
        sync(chain(P))
        compile_s = time.perf_counter() - t0
        t = best(chain, P)
        ns = (t - t_null) / REP / L * 1e9
        print(f"block={block:5d}  chain {t*1e3:7.2f} ms  "
              f"padd {ns:6.2f} ns/lane  (compile {compile_s:.0f}s)", flush=True)
    except Exception as e:
        print(f"block={block:5d}  FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
