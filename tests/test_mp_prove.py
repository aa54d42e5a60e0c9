"""Multiparty full-protocol prover (core/mp_prove.py).

N parties each hold a disjoint subset of an aggregated schema's ranges
and jointly produce ONE standard proof via the dealer combinators
(reference dealer semantics: src/ZKP.hs:106-131).  Verified here:

* one party owning everything is BYTE-identical to the single prover
  (the MPC decomposition is exact);
* 2-party and 3-party splits over shared-digit and typed/assumed
  schemas verify with the plain verifier and round-trip the wire format;
* a tampered witness share yields a proof that verifies False;
* an unowned range aborts the dealer (identity in the commitment sum).
"""

import threading

import test_examples_e2e as ex
from bulletproofspp_tpu.cli import _resolve_values
from bulletproofspp_tpu.core import range_proof as rpm
from bulletproofspp_tpu.core.engine import HostEngine
from bulletproofspp_tpu.core.mp_prove import dealer_prove, party_prove
from bulletproofspp_tpu.core.multiparty import LocalChannel
from bulletproofspp_tpu.core.transcript import take_points
from bulletproofspp_tpu.io_ import schema as schema_mod

ENGINE = HostEngine()


def _setup_values(spec_obj, wit_obj):
    spec = schema_mod.parse_spec(spec_obj)
    points = take_points(spec.basis_seed.encode(), schema_mod.points_needed(spec))
    setup = schema_mod.build_setup(spec, points)
    values = _resolve_values(spec, schema_mod.parse_witness(wit_obj))
    return spec, setup, values


def _run_mp(setup, values, partition, seeds=None, channel_wrap=None):
    """partition: list of index lists, one per party.  Returns the proof."""
    channels = []
    threads = []
    errors = []
    for k, part in enumerate(partition):
        ch = LocalChannel()
        if channel_wrap is not None:
            ch = channel_wrap(k, ch)
        channels.append(ch)
        owned = {i: values[i] for i in part}
        seed = (seeds[k] if seeds else f"mp party {k}").encode()

        def work(ch=ch, owned=owned, seed=seed):
            try:
                party_prove(setup, ch, owned, seed, ENGINE)
            except Exception as exc:  # pragma: no cover - surfaced below
                errors.append(exc)

        th = threading.Thread(target=work, daemon=True)
        th.start()
        threads.append(th)
    # dealer in a thread too: if a party dies, run_dealer would block on
    # its channel forever — surface the party's exception instead
    result = {}

    def dealer_work():
        try:
            result["proof"] = dealer_prove(setup, channels, ENGINE)
        except Exception as exc:  # pragma: no cover - surfaced below
            errors.append(exc)

    dth = threading.Thread(target=dealer_work, daemon=True)
    dth.start()
    for th in threads + [dth]:
        th.join(timeout=120)
    if errors:
        raise errors[0]
    if "proof" not in result:
        raise TimeoutError("multiparty run deadlocked (no party error reported)")
    return result["proof"]


def test_mp_single_party_byte_parity():
    """One party owning all ranges reproduces the single prover's proof
    bytes exactly (same randomness seed => same transcript)."""
    spec, setup, values = _setup_values(ex.EX_32BIT, ex.WIT_32BIT)
    solo = rpm.prove(setup, values, spec.random_seed.encode(), ENGINE)
    mp = _run_mp(setup, values, [list(range(len(values)))], seeds=[spec.random_seed])
    assert rpm.encode_proof(setup, mp) == rpm.encode_proof(setup, solo)
    assert rpm.verify(setup, mp, ENGINE)


def test_mp_two_party_shared_digits():
    """4x32-bit shared-digit aggregate, split 2+2: shared multiplicity
    slots receive additive contributions from BOTH parties."""
    spec_obj = {
        "argument": "NL",
        "basisSeed": "mp test basis",
        "randomSeed": "mp test rand",
        "ranges": [{"count": 4, "max": 2**32, "isShared": True, "base": 16}],
    }
    wit_obj = [{"amount": a} for a in (0, 77, 2**31 + 5, 2**32 - 1)]
    spec, setup, values = _setup_values(spec_obj, wit_obj)
    proof = _run_mp(setup, values, [[0, 2], [1, 3]])
    assert rpm.verify(setup, proof, ENGINE)
    # wire round-trip through the standard encoder/decoder
    coms_b, proof_b = rpm.encode_proof(setup, proof)
    dec = rpm.decode_proof(setup, coms_b, proof_b, ENGINE)
    assert dec is not None and rpm.verify(setup, dec, ENGINE)


def test_mp_three_party_typed_conserved():
    """The typed rec_test fixture (shared bases 3 and 16, one assumed
    range, a public value) split across 3 parties: type conservation is
    a JOINT property that only holds on the aggregate."""
    spec, setup, values = _setup_values(ex.EX_REC, ex.WIT_REC)
    assert len(values) == 3
    proof = _run_mp(setup, values, [[0], [1], [2]])
    assert rpm.verify(setup, proof, ENGINE)


def test_mp_broken_conservation_fails():
    """A party misdeclaring its type total produces a proof that fails
    verification (no party can check conservation locally)."""
    import copy

    wit = copy.deepcopy(ex.WIT_REC)
    wit[1]["amount"] = int(wit[1]["amount"]) + 1  # still in range, breaks sum
    spec, setup, values = _setup_values(ex.EX_REC, wit)
    proof = _run_mp(setup, values, [[0], [1], [2]])
    assert not rpm.verify(setup, proof, ENGINE)


def test_mp_tampered_share_fails():
    """A corrupted witness share from one party must yield an invalid
    proof (dealer soundness is unconditional)."""

    class Tamper:
        def __init__(self, inner):
            self.inner = inner

        def send(self, msg):
            if msg[0] == "done":
                ops = list(msg[1])
                # index 1 = first LIN slot (index 0, the tracked scalar,
                # never travels: the verifier recomputes it from the
                # verification equation, so tampering it is harmless)
                ops[1] = int(ops[1]) + 1
                msg = ("done", ops)
            self.inner.send(msg)

        def recv(self):
            return self.inner.recv()

        # dealer side passes through
        def dealer_send(self, m):
            self.inner.dealer_send(m)

        def dealer_recv(self):
            return self.inner.dealer_recv()

    spec, setup, values = _setup_values(ex.EX_32BIT, ex.WIT_32BIT)
    proof = _run_mp(
        setup,
        values,
        [list(range(len(values)))],
        channel_wrap=lambda k, ch: Tamper(ch),
    )
    assert not rpm.verify(setup, proof, ENGINE)


def test_mp_unowned_range_aborts():
    """A range owned by nobody leaves the identity in the aggregated
    input-commitment vector; the dealer must abort, not emit a proof."""
    import pytest

    spec_obj = {
        "basisSeed": "mp test basis 2",
        "randomSeed": "mp test rand 2",
        "ranges": [{"count": 2, "max": 2**16}],
    }
    wit_obj = [{"amount": 3}, {"amount": 9}]
    spec, setup, values = _setup_values(spec_obj, wit_obj)
    channels = [LocalChannel()]
    th = threading.Thread(
        target=lambda: party_prove(setup, channels[0], {0: values[0]}, b"p0", ENGINE),
        daemon=True,
    )
    th.start()
    with pytest.raises(ValueError):
        dealer_prove(setup, channels, ENGINE)


def test_mp_out_of_range_value_rejected_locally():
    """make_phase1s rejects an out-of-range owned value before anything
    is sent."""
    import pytest

    spec_obj = {
        "basisSeed": "mp test basis 3",
        "randomSeed": "mp test rand 3",
        "ranges": [{"count": 1, "max": 2**16}],
    }
    spec, setup, _ = _setup_values(spec_obj, [{"amount": 1}])
    ch = LocalChannel()
    with pytest.raises(ValueError):
        party_prove(setup, ch, {0: ((2**16, 0), 12345)}, b"p0", ENGINE)


# ---------------------------------------------------------------------------
# binary protocol family (reference: src/RangeProof/Binary.hs)
# ---------------------------------------------------------------------------


def test_mp_binary_single_party_byte_parity():
    spec, setup, values = _setup_values(ex.EX_BIN, ex.WIT_BIN)
    solo = rpm.prove(setup, values, spec.random_seed.encode(), ENGINE)
    mp = _run_mp(setup, values, [list(range(len(values)))], seeds=[spec.random_seed])
    assert rpm.encode_proof(setup, mp) == rpm.encode_proof(setup, solo)


def test_mp_binary_two_party():
    spec_obj = {
        "binary": True,
        "basisSeed": "mp bin basis",
        "randomSeed": "mp bin rand",
        "ranges": [{"count": 4, "max": 2**32}],
    }
    wit_obj = [{"amount": a} for a in (1, 0, 2**31, 2**32 - 1)]
    spec, setup, values = _setup_values(spec_obj, wit_obj)
    proof = _run_mp(setup, values, [[0, 3], [1, 2]])
    assert rpm.verify(setup, proof, ENGINE)
    coms_b, proof_b = rpm.encode_proof(setup, proof)
    dec = rpm.decode_proof(setup, coms_b, proof_b, ENGINE)
    assert dec is not None and rpm.verify(setup, dec, ENGINE)


def test_mp_binary_assumed_range():
    """Assumed binary ranges commit no digits; the compacted row layout
    and the unowned blinding-tail rows must still verify under MPC."""
    spec_obj = {
        "binary": True,
        "basisSeed": "mp bin assumed",
        "randomSeed": "mp bin assumed rand",
        "ranges": [
            {"max": 2**16},
            {"max": 2**8, "isAssumed": True},
            {"max": 2**16},
        ],
    }
    wit_obj = [{"amount": 1234}, {"amount": 77}, {"amount": 999}]
    spec, setup, values = _setup_values(spec_obj, wit_obj)
    proof = _run_mp(setup, values, [[0, 1], [2]])
    assert rpm.verify(setup, proof, ENGINE)


def test_mp_binary_tampered_share_fails():
    """A corrupted binary witness share must yield an invalid proof."""

    class Tamper:
        def __init__(self, inner):
            self.inner = inner

        def send(self, msg):
            if msg[0] == "done":
                ops = list(msg[1])
                ops[-1] = int(ops[-1]) + 1  # last norm row
                msg = ("done", ops)
            self.inner.send(msg)

        def recv(self):
            return self.inner.recv()

        def dealer_send(self, m):
            self.inner.dealer_send(m)

        def dealer_recv(self):
            return self.inner.dealer_recv()

    spec, setup, values = _setup_values(ex.EX_BIN, ex.WIT_BIN)
    proof = _run_mp(
        setup,
        values,
        [list(range(len(values)))],
        channel_wrap=lambda k, ch: Tamper(ch),
    )
    assert not rpm.verify(setup, proof, ENGINE)


def test_mp_binary_broken_conservation_fails():
    """Binary conservation (cons) is enforced by the x-weighted input
    coefficients; no party can check it locally, and a violated sum
    yields a failing proof."""
    spec_obj = {
        "binary": True,
        "conserved": True,
        "basisSeed": "mp bin cons",
        "randomSeed": "mp bin cons rand",
        "ranges": [{"max": 2**16}, {"max": 2**16, "isOutput": True}],
    }
    spec, setup, values = _setup_values(
        spec_obj, [{"amount": 500}, {"amount": 500}]
    )
    good = _run_mp(setup, values, [[0], [1]])
    assert rpm.verify(setup, good, ENGINE)
    spec, setup, values = _setup_values(
        spec_obj, [{"amount": 500}, {"amount": 501}]
    )
    bad = _run_mp(setup, values, [[0], [1]])
    assert not rpm.verify(setup, bad, ENGINE)
