"""ops.fr (scalar-field mod-R limb arithmetic) vs exact host integers."""

import random

import numpy as np
import jax.numpy as jnp

from bulletproofspp_tpu.core.fields import R
from bulletproofspp_tpu.ops import fr


def _rand_vals(n, rng):
    edge = [0, 1, 2, R - 1, R - 2, R + 1, (1 << 256) - 1, (1 << 255), fr.C_R, R]
    out = [e % (1 << 256) for e in edge]
    while len(out) < n:
        out.append(rng.getrandbits(256))
    return out[:n]


def test_add_sub_mul_vs_host():
    rng = random.Random(0xF12)
    n = 64
    a = _rand_vals(n, rng)
    b = list(reversed(_rand_vals(n, rng)))
    A = jnp.asarray(fr.pack_ints(a))
    B = jnp.asarray(fr.pack_ints(b))
    got_add = fr.unpack_ints(np.asarray(fr.normalize(fr.add(A, B))))
    got_sub = fr.unpack_ints(np.asarray(fr.normalize(fr.sub(A, B))))
    got_mul = fr.unpack_ints(np.asarray(fr.normalize(fr.mul(A, B))))
    for i in range(n):
        assert got_add[i] == (a[i] + b[i]) % R
        assert got_sub[i] == (a[i] - b[i]) % R
        assert got_mul[i] == (a[i] * b[i]) % R


def test_saturated_operands():
    # all-0xffff limbs (max representative) through every op
    top = (1 << 256) - 1
    vals = [top, top - 1, R, R - 1, 0]
    A = jnp.asarray(fr.pack_ints(vals))
    B = jnp.asarray(fr.pack_ints(list(reversed(vals))))
    got = fr.unpack_ints(np.asarray(fr.normalize(fr.mul(A, B))))
    for i, (x, y) in enumerate(zip(vals, reversed(vals))):
        assert got[i] == x * y % R
    got = fr.unpack_ints(np.asarray(fr.normalize(fr.add(A, B))))
    for i, (x, y) in enumerate(zip(vals, reversed(vals))):
        assert got[i] == (x + y) % R


def test_mul_chain_stays_carried():
    # repeated squaring keeps limbs < 2^16 (carried invariant) and value
    # correct: adversarial for dropped-carry bugs in the fold chain
    rng = random.Random(7)
    v = rng.getrandbits(256)
    A = jnp.asarray(fr.pack_ints([v]))
    ref = v % R
    for _ in range(50):
        A = fr.mul(A, A)
        ref = ref * ref % R
        arr = np.asarray(A)
        assert arr.max() <= 0xFFFF
    assert fr.unpack_ints(np.asarray(fr.normalize(A)))[0] == ref


def test_inv_and_batch_inv():
    rng = random.Random(3)
    vals = [0, 1, R - 1] + [rng.getrandbits(256) % R for _ in range(13)]
    A = jnp.asarray(fr.pack_ints(vals))
    got = fr.unpack_ints(np.asarray(fr.normalize(fr.inv(A))))
    for i, v in enumerate(vals):
        assert got[i] == (pow(v, -1, R) if v % R else 0)
    got = fr.unpack_ints(np.asarray(fr.normalize(fr.batch_inv(A))))
    for i, v in enumerate(vals):
        assert got[i] == (pow(v, -1, R) if v % R else 0)


def test_is_zero_eq_normalize():
    vals = [0, R, 2 * R - 1 if 2 * R - 1 < (1 << 256) else R, 5, R + 5]
    A = jnp.asarray(fr.pack_ints(vals))
    z = np.asarray(fr.is_zero(A))
    assert list(z) == [v % R == 0 for v in vals]
    B = jnp.asarray(fr.pack_ints([0, 0, R - 1, R + 5, 5]))
    e = np.asarray(fr.eq(A, B))
    assert list(e) == [(v % R) == (w % R) for v, w in zip(vals, [0, 0, R - 1, R + 5, 5])]


def test_mul_wide_exact():
    rng = random.Random(11)
    a = [rng.getrandbits(256) for _ in range(8)]
    b = [rng.getrandbits(130) for _ in range(8)]
    A = jnp.asarray(fr.pack_ints(a))
    B = jnp.asarray(fr.pack_ints(b))[:9]  # 130-bit values fit 9 limbs
    wide = np.asarray(fr.mul_wide(A, B))
    for i in range(8):
        v = int.from_bytes(
            np.ascontiguousarray(wide[:, i].astype("<u2")).tobytes(), "little"
        )
        assert v == a[i] * b[i]
