"""Dealer/client multiparty combinators (reference: src/ZKP.hs:106-131):
in-process transport, group-sum aggregation, broadcast challenges, and
summed final openings — multi-node semantics without a cluster."""

import threading

from bulletproofspp_tpu.core import ec
from bulletproofspp_tpu.core.fields import R
from bulletproofspp_tpu.core.multiparty import ClientOracle, LocalChannel, run_dealer
from bulletproofspp_tpu.core.transcript import Transcript


def test_dealer_aggregates_and_broadcasts():
    nparties = 3
    chans = [LocalChannel() for _ in range(nparties)]
    # party i commits share s_i * G; dealer must see (sum s_i) * G
    shares = [[7, 11], [13, 17], [19, 23]]

    def party(i):
        oracle = ClientOracle(chans[i])
        pts = [ec.scalar_mul(s, ec.G) for s in shares[i]]
        challenge = oracle.oracle(pts, 1)
        # every party must receive the same challenge
        results[i] = challenge
        oracle.done([s * challenge[0] % R for s in shares[i]])

    results = [None] * nparties
    threads = [threading.Thread(target=party, args=(i,)) for i in range(nparties)]
    for t in threads:
        t.start()

    tr = Transcript(None)
    summed, rounds, challenges = run_dealer(chans, tr)
    for t in threads:
        t.join()

    assert results[0] == results[1] == results[2]
    # aggregate commitments are the group sums of the shares
    tot = [sum(col) for col in zip(*shares)]
    assert rounds[0] == [ec.scalar_mul(t, ec.G) for t in tot]
    # dealer-side transcript equals a single-prover transcript on the sums
    tr2 = Transcript(None)
    assert results[0] == tr2.oracle(rounds[0], 1)
    # final openings combine additively
    e = results[0][0]
    assert summed == [t * e % R for t in tot]


def test_dealer_over_sockets():
    """Same protocol over the TCP transport (the DCN stand-in,
    reference: ZKP.hs:110-111 'Chan, socket')."""
    from bulletproofspp_tpu.core.multiparty import (
        SocketChannel,
        make_dealer_listener,
        run_dealer_on_listener,
    )

    nparties = 2
    shares = [[3, 5], [8, 21]]
    listener, port = make_dealer_listener()
    results = [None] * nparties

    def party(i):
        ch = SocketChannel.connect("127.0.0.1", port)
        try:
            oracle = ClientOracle(ch)
            pts = [ec.scalar_mul(s, ec.G) for s in shares[i]]
            challenge = oracle.oracle(pts, 1)
            results[i] = challenge
            oracle.done([s * challenge[0] % R for s in shares[i]])
        finally:
            ch.close()

    threads = [threading.Thread(target=party, args=(i,)) for i in range(nparties)]
    for t in threads:
        t.start()
    tr = Transcript(None)
    try:
        summed, rounds, challenges = run_dealer_on_listener(listener, tr, nparties)
    finally:
        listener.close()
    for t in threads:
        t.join()

    assert results[0] == results[1]
    tot = [sum(col) for col in zip(*shares)]
    assert rounds[0] == [ec.scalar_mul(t, ec.G) for t in tot]
    e = results[0][0]
    assert summed == [t * e % R for t in tot]


def test_aggregated_opening_demo():
    """End-to-end multiparty aggregated-opening PoK (the CLI mp-demo
    protocol): N parties with secret Pedersen openings; the dealer's
    Schnorr check on the aggregates must accept — and reject when one
    party lies in its final response share."""
    from bulletproofspp_tpu.core.multiparty import (
        dealer_aggregated_opening,
        run_party_share,
    )

    nparties = 3
    for tamper in (False, True):
        chans = [LocalChannel() for _ in range(nparties)]
        threads = []
        for i in range(nparties):
            def party(i=i):
                if tamper and i == 1:
                    # dishonest response share: run the honest protocol but
                    # shift the final opening by 1
                    ch = chans[i]
                    orig_send = ch.send

                    def send(msg):
                        if msg[0] == "done":
                            msg = (msg[0], [(int(msg[1][0]) + 1) % R] + list(msg[1][1:])) + msg[2:]
                        orig_send(msg)

                    ch.send = send
                run_party_share(chans[i], value=100 + i, blind=7 * i + 1, seed=bytes([i]))

            threads.append(threading.Thread(target=party))
        for t in threads:
            t.start()
        ok, c_agg = dealer_aggregated_opening(chans, Transcript(None))
        for t in threads:
            t.join()
        assert ok == (not tamper)
        assert c_agg is not None


def _one_shot_dealer(msg):
    """Run the dealer against a single scripted party message; returns
    the raised exception type (or None)."""
    import pytest  # noqa: F401

    ch = LocalChannel()
    ch.send(msg)
    try:
        run_dealer([ch], Transcript(None))
    except ValueError as exc:
        return exc
    return None


def test_dealer_rejects_unreasonable_challenge_count():
    """k drives oracle work: a party-supplied huge k is a dealer DoS."""
    exc = _one_shot_dealer(("commit", [ec.G], 1 << 32))
    assert exc is not None and "challenge count" in str(exc)


def test_dealer_rejects_off_curve_point():
    exc = _one_shot_dealer(("commit", [(5, 7)], 1))
    assert exc is not None and "off-curve" in str(exc)
