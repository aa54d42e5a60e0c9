"""Multiparty-prover combinators: dealer / client oracle.

The reference ships exactly two transport-parametric stubs and never wires
them to the CLI (reference: src/ZKP.hs:106-131): a client that ships its
commitment batch to a dealer and receives the oracle output
(``multiPartyClientOracle``, ZKP.hs:114-118), and a dealer that sums the
per-party commitment vectors elementwise in the group, runs the REAL
oracle on the aggregate, and broadcasts the result until parties stop
(``multiPartyDealer``, ZKP.hs:124-131).

This module is the faithful TPU-framework equivalent, with the same
contract and the same status (aggregation semantics + transport harness;
a fully multiparty BP++ prover additionally needs the MPC cross-term
protocol, which the reference also does not implement).  The transport is
any object with ``send``/``recv``; ``LocalChannel`` gives in-process
queues so the combinators are testable without a cluster (SURVEY §4
"multi-node testing without a cluster").  In a TPU pod deployment the
dealer reduction maps to a ``psum``-style group-add over DCN with host 0
as dealer (SURVEY §5 distributed-backend mapping).
"""

from __future__ import annotations

import queue
from dataclasses import dataclass, field

from . import ec


@dataclass
class LocalChannel:
    """In-process duplex channel (client endpoint <-> dealer endpoint)."""

    to_dealer: queue.Queue = field(default_factory=queue.Queue)
    to_client: queue.Queue = field(default_factory=queue.Queue)

    # client side
    def send(self, msg):
        self.to_dealer.put(msg)

    def recv(self):
        return self.to_client.get()

    # dealer side
    def dealer_send(self, msg):
        self.to_client.put(msg)

    def dealer_recv(self):
        return self.to_dealer.get()


class ClientOracle:
    """Client-side oracle: ships commitments, receives challenge scalars
    (reference: multiPartyClientOracle, ZKP.hs:114-118).  Drop-in for the
    ``oracle`` method of core.transcript.Transcript."""

    def __init__(self, channel):
        self.channel = channel

    def oracle(self, new_points, k: int = 1):
        self.channel.send(("commit", list(new_points), k))
        return self.channel.recv()

    def done(self, openings):
        """Final message: the party's additive share of the openings."""
        self.channel.send(("done", openings, 0))


def run_dealer(channels, transcript):
    """Dealer loop (reference: multiPartyDealer, ZKP.hs:124-131):

    per round, receive one commitment batch from every party, sum the
    vectors elementwise in the group (zipWith (^+^)), feed the aggregate
    to the real transcript oracle, and broadcast the challenges; when all
    parties send final openings, return their elementwise scalar sum and
    the aggregated commitment transcript.
    """
    rounds = []
    while True:
        msgs = [ch.dealer_recv() for ch in channels]
        kinds = {m[0] for m in msgs}
        if kinds == {"done"}:
            n = len(msgs[0][1])
            if any(len(m[1]) != n for m in msgs):
                raise ValueError("parties returned differing opening lengths")
            # openings combine in the scalar field (the reference's
            # zipWith (^+^) is vector-space addition, ZKP.hs:129)
            from .fields import R

            summed = [sum(int(m[1][i]) for m in msgs) % R for i in range(n)]
            return summed, rounds
        if kinds != {"commit"}:
            raise ValueError("parties out of sync (mixed commit/done round)")
        n = len(msgs[0][1])
        k = msgs[0][2]
        if any(len(m[1]) != n or m[2] != k for m in msgs):
            raise ValueError("parties sent differing batch shapes")
        agg = [None] * n
        for _, pts, _ in msgs:
            agg = [ec.add(a, p) for a, p in zip(agg, pts)]
        rounds.append(agg)
        out = transcript.oracle(agg, k)
        for ch in channels:
            ch.dealer_send(out)
