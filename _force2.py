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
for n in (2048, 32768):
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
    sets = [digits(i) for i in range(4)]
    jax.block_until_ready(sets)
    out = run_msm(px, py, pz, *sets[0]); _ = np.asarray(out[0])
    # correctness check vs host at n=2048 (same scalars as digits(0))
    if n == 2048:
        got = curve.to_affine_host(out)[0]
        r0 = random.Random(0)
        svals = [r0.randrange(R) for _ in range(n)]
        want = ec.msm_host(svals, pts)
        print("correct:", got == want, flush=True)
    times = []
    for a in sets[1:]:
        t0 = time.perf_counter()
        out = run_msm(px, py, pz, *a)
        _ = np.asarray(out[0])
        times.append(time.perf_counter() - t0)
    print(f"n={n}: forced per-msm {[round(t*1e3) for t in times]} ms", flush=True)
