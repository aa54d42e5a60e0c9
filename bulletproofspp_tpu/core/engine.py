"""Commitment engine abstraction: where EC work actually executes.

The protocol layer (arguments, range proofs) is engine-agnostic; the
engine provides the three hot EC primitives:

  * ``msm(pairs)``            — multi-scalar multiplication (the workhorse;
                                reference: src/Commitment.hs:311-353)
  * ``fold_bases(b,a,ge,go)`` — per-round basis folding b*G_even + a*G_odd
                                with shared ~sqrt(p)-size scalars
                                (reference: src/Commitment.hs:343-353)
  * ``shared_mul(k, pts)``    — k*P_i for a shared scalar (square-completion
                                basis transform, reference:
                                src/Bulletproof/InnerProductArgument.hs:194-206)

``HostEngine`` is the exact-integer ground truth.  ``JaxEngine``
(bulletproofspp_tpu.ops.engine) runs the same math as batched limb
kernels on TPU and must produce identical points.
"""

from __future__ import annotations

from . import ec
from .fields import R


class HostEngine:
    """Pure-Python engine (ground truth / small inputs)."""

    def msm(self, pairs):
        flt = [(int(s) % R, p) for s, p in pairs]
        flt = [(s, p) for s, p in flt if s != 0 and p is not None]
        return ec.msm_host([s for s, _ in flt], [p for _, p in flt])

    def fold_bases(self, b: int, a: int, g_even, g_odd):
        return [ec.double_base_mul(b, ge, a, go) for ge, go in zip(g_even, g_odd)]

    def shared_mul(self, k: int, pts):
        k = int(k) % R
        return [ec.scalar_mul(k, p) for p in pts]


_default_engine = None


def default_engine():
    """Process-wide engine: JAX-backed when available, host otherwise.

    Controlled by env var BPPP_ENGINE in {"host", "jax"}.
    """
    global _default_engine
    if _default_engine is None:
        import os

        choice = os.environ.get("BPPP_ENGINE", "jax")
        if choice == "host":
            _default_engine = HostEngine()
        else:
            try:
                from ..ops.engine import JaxEngine

                _default_engine = JaxEngine()
            except Exception:
                _default_engine = HostEngine()
    return _default_engine


def set_default_engine(engine):
    global _default_engine
    _default_engine = engine
