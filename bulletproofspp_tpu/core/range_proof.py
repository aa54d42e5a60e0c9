"""Range-proof driver: prove/verify orchestration + wire format.

(reference: src/RangeProof.hs)

A proof consists of the final witness scalars and the point list
[range-proof commitments] ++ [L/R responses in reverse round order]
(the reference accumulates responses last-round-first,
reference: Bulletproof.hs:357-359 + RangeProof.hs:60-66).  The input
value commitments travel in a separate commitments file.
"""

from __future__ import annotations

from dataclasses import dataclass

from .fields import Fr
from .transcript import Transcript
from .encoding import encode_scalars_points, decode_scalars_points, encode_commitments, decode_commitments
from .bulletproof import BPProof, verify_bp
from .engine import default_engine
from .utils import pairs as _pairs, unpairs as _unpairs


@dataclass
class RangeProof:
    rp_coms: list  # protocol commitments (blCom, ... )
    input_coms: list  # per-value commitments (separate coms file)
    bp: BPProof


def prove(setup, values, random_seed: bytes, engine=None) -> RangeProof:
    """Run the full prover (reference: RangeProof.hs:95-97)."""
    engine = engine or default_engine()
    wit = setup.witness(values)
    if wit is None:
        raise ValueError("invalid witness")
    tr = Transcript(random_seed)
    coms, _bp_setup, bp = setup.prove(tr, engine, values, wit)
    n_rp = setup.info()[0]
    return RangeProof(coms[:n_rp], coms[n_rp:], bp)


def verify(setup, rp: RangeProof, engine=None) -> bool:
    """Run the full verifier (reference: RangeProof.hs:99-101)."""
    engine = engine or default_engine()
    tr = Transcript(None)
    coms = list(rp.rp_coms) + list(rp.input_coms)
    try:
        bp_setup = setup.verify_setup(tr, coms)
    except (ValueError, TypeError, IndexError):
        # malformed structure (wrong commitment count/shape) => reject,
        # never raise (reference: src/RangeProof.hs:68-85 decode-side
        # validation; here the library API is hardened too)
        return False
    return verify_bp(tr, engine, bp_setup, rp.bp)


def encode_proof(setup, rp: RangeProof) -> tuple[bytes, bytes]:
    """Returns (coms_file_bytes, proof_file_bytes)
    (reference: RangeProof.hs:60-66, app/Main.hs:179-182)."""
    bp_coms = _unpairs(list(reversed(rp.bp.responses)))
    proof_bytes = encode_scalars_points(rp.bp.wit_scalars, list(rp.rp_coms) + bp_coms)
    coms_bytes = encode_commitments(rp.input_coms)
    return coms_bytes, proof_bytes


def decode_proof(setup, coms_bytes: bytes, proof_bytes: bytes):
    """Returns a RangeProof or None (reference: RangeProof.hs:68-85)."""
    num_rp, nrm_len, lin_len = setup.info()
    rounds, (n_nrm, n_lin) = setup.arg_cls.optimal_witness_size(nrm_len, lin_len)
    res = decode_commitments(setup.n_input_coms(), coms_bytes)
    if res is None:
        return None
    input_coms, _ = res
    res = decode_scalars_points(n_nrm + n_lin, num_rp + 2 * rounds, proof_bytes)
    if res is None:
        return None
    scalars, points = res
    rp_coms, bp_coms = points[:num_rp], points[num_rp:]
    responses = list(reversed(_pairs(bp_coms)))
    return RangeProof(rp_coms, input_coms, BPProof(responses, [Fr(s) for s in scalars]))
