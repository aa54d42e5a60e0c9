import time, numpy as np, jax, jax.numpy as jnp
from bulletproofspp_tpu.core import ec
from bulletproofspp_tpu.ops import curve, limb
from bulletproofspp_tpu.ops.pallas_field import padd_pallas
from bulletproofspp_tpu.core.fields import Q
print("devices:", jax.devices(), flush=True)
L = 65536; REP = 8
px0, py0, pz0 = curve.from_affine_host([ec.G])
P = tuple(jnp.tile(t, (1, L)) for t in (px0, py0, pz0))
@jax.jit
def chain(p):
    for _ in range(REP):
        p = padd_pallas(p, p, block=512)
    return p
def sync(x): return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])
t0 = time.perf_counter()
sync(chain(P))
print(f"chain compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)
def best(fn, *a, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); sync(fn(*a)); ts.append(time.perf_counter()-t0)
    return min(ts)
t_null = best(jax.jit(lambda x: x + 1), jnp.zeros((1,), jnp.uint32))
t_chain = best(chain, P)
t_padd = (t_chain - t_null) / REP / L
print(f"null {t_null*1e3:.2f} ms  chain {t_chain*1e3:.2f} ms  padd {t_padd*1e9:.2f} ns/lane (was 15.7)", flush=True)
r = chain(P)
xs, ys, zs = (np.asarray(t)[:, :1] for t in r)
x, y, z = (limb.unpack_ints(t)[0] for t in (xs, ys, zs))
zi = pow(z, Q-2, Q)
print("on-chip chain result correct:", (x*zi % Q, y*zi % Q) == ec.scalar_mul(2**REP, ec.G), flush=True)
