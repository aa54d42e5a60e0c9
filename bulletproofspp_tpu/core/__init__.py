"""Protocol layer: field/curve ground truth, transcript, arguments, range proofs.

Note: ``core.eis`` (the Eisenstein-integer toolkit) is intentionally
production-unused — the production GLV path hard-derives its lattice in
``ops.glv``; ``core.eis`` exists as an independent cross-check exercised
by tests/test_eis.py (it re-derives pi, omega and the lattice from first
principles, where the reference hard-codes them, FastSECP256K1.hs:37-60).
"""
