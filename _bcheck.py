import os, time, random
import jax, jax.numpy as jnp
from bulletproofspp_tpu.core import ec
from bulletproofspp_tpu.core.fields import R
from bulletproofspp_tpu.ops import glv, limb, curve
from bulletproofspp_tpu.ops.msm import run_msm

rng = random.Random(3)
n = 256
pts, p = [], ec.G
for _ in range(n):
    pts.append(p); p = ec.dbl(p)
def prep(scalars):
    halves, lane_pts = [], []
    for s, pt in zip(scalars, pts):
        k1, k2 = glv.split(s)
        halves += [k1, k2]
        lane_pts += [pt, (ec.BETA * pt[0] % ec.P, pt[1])]
    absd, sgn = glv.recode_batch(halves)
    px = jnp.asarray(limb.pack_ints([q[0] for q in lane_pts]))
    py = jnp.asarray(limb.pack_ints([q[1] for q in lane_pts]))
    return px, py, jnp.asarray(absd), jnp.asarray(sgn)

s1 = [rng.randrange(R) for _ in range(n)]
args1 = prep(s1)
out = run_msm(*args1); jax.block_until_ready(out)
print("correct:", curve.to_affine_host(out)[0] == ec.msm_host(s1, pts), flush=True)

# timing with same args 20x
t0=time.perf_counter()
for _ in range(20): out = run_msm(*args1)
jax.block_until_ready(out)
print(f"same-args x20: {(time.perf_counter()-t0)/20*1e3:.2f} ms/msm", flush=True)

# timing with distinct digit arrays (prevent any caching)
argsets = [prep([rng.randrange(R) for _ in range(n)]) for _ in range(5)]
for a in argsets: jax.block_until_ready(a)
t0=time.perf_counter()
outs=[run_msm(*a) for a in argsets]
jax.block_until_ready(outs)
print(f"distinct x5: {(time.perf_counter()-t0)/5*1e3:.2f} ms/msm", flush=True)
