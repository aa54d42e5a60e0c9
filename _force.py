import time, random
import numpy as np
import jax, jax.numpy as jnp
from bulletproofspp_tpu.core import ec
from bulletproofspp_tpu.core.fields import R
from bulletproofspp_tpu.ops import curve
from bulletproofspp_tpu.ops.engine import _interleave_endo
from bulletproofspp_tpu.ops.msm import run_msm
from bulletproofspp_tpu import native

rng = random.Random(7)
n = 32768
base = [ec.scalar_mul(rng.randrange(1, R), ec.G) for _ in range(64)]
pts = (base * (n // 64))[:n]
x, y, z = curve.from_affine_host(pts)
px, py, pz = _interleave_endo(x, y, z)
jax.block_until_ready((px, py, pz))

def digits(seed):
    r = random.Random(seed)
    svals = [r.randrange(R) for _ in range(n)]
    a, s = native.glv_recode_batch(svals)
    return jnp.asarray(a), jnp.asarray(s)

sets = [digits(i) for i in range(6)]
jax.block_until_ready(sets)
out = run_msm(px, py, pz, *sets[0])
_ = np.asarray(out[0])
times = []
for a in sets:
    t0 = time.perf_counter()
    out = run_msm(px, py, pz, *a)
    _ = np.asarray(out[0])  # forced device->host materialization
    times.append(time.perf_counter() - t0)
print("forced per-msm ms:", [round(t*1e3,1) for t in times], flush=True)
# estimate RTT: materialize a trivial computation
t0 = time.perf_counter()
for _ in range(5):
    _ = np.asarray((px[:1,:1] + 1))
print(f"approx RTT+tiny-op: {(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)
