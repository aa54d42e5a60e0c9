"""Batch verification: N proofs -> ONE random-linear-combination MSM.

The reference lists batch verification as unimplemented future work
(reference: README.md:186 "Batch verification of multiple proofs",
src/RangeProof.hs:103-106, src/RangeProof/TypedReciprocal.hs:469-473).
This module implements it as the flagship multi-chip workload (SURVEY §2:
"random-linear-combination batch verifier: N proofs → one giant MSM
sharded across a pod slice").

Soundness: each proof's zero-check MSM Z_i must be the identity; checking
sum_i rho_i * Z_i == identity for independent uniform rho_i accepts a batch
containing an invalid proof with probability 1/r.  Scalars for repeated
basis points are merged on host so the combined MSM stays near the size of
a single verification for same-schema batches.
"""

from __future__ import annotations

import hashlib

from .bulletproof import verify_bp_pairs
from .fields import R
from .transcript import Transcript, decode_scalar


def _rhos(n: int, seed: bytes):
    """Deterministic verifier randomness for the linear combination (any
    unpredictable-to-the-prover source works; a seeded hash keeps runs
    reproducible)."""
    return [
        decode_scalar(hashlib.sha256(b"batch " + seed + str(i).encode()).digest(), R) | 1
        for i in range(n)
    ]


def collect_pairs(setup, rp):
    """One proof's zero-check MSM pairs (transcript replay only, no EC
    work), or None if the proof is structurally invalid."""
    tr = Transcript(None)
    coms = list(rp.rp_coms) + list(rp.input_coms)
    try:
        bp_setup = setup.verify_setup(tr, coms)
    except ValueError:
        return None
    return verify_bp_pairs(tr, bp_setup, rp.bp)


def batch_verify(items, engine=None, seed: bytes = b"") -> bool:
    """items: iterable of (setup, RangeProof).  True iff ALL proofs verify
    (up to the 1/r soundness error of the linear combination)."""
    from .engine import default_engine

    engine = engine or default_engine()
    items = list(items)
    if not items:
        return True
    rhos = _rhos(len(items), seed)
    merged: dict = {}
    for rho, (setup, rp) in zip(rhos, items):
        pairs = collect_pairs(setup, rp)
        if pairs is None:
            return False
        for s, p in pairs:
            if p is None:
                continue
            merged[p] = (merged.get(p, 0) + rho * int(s)) % R
    return engine.msm([(s, p) for p, s in merged.items() if s]) is None
