#!/bin/bash
# Round-3 TPU validation leg: run the moment the axon tunnel returns.
# ONE TPU process at a time (single-tenant chip).  Logs to /tmp/r3leg.
set -u
OUT=/tmp/r3leg
mkdir -p "$OUT"
cd /root/repo

step() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }

step "1/5 bench (BENCH_FULL: headline + kernel ns/lane + serve + 1024-batch)"
BENCH_FULL=1 timeout 3000 python bench.py >"$OUT/bench.json" 2>"$OUT/bench.stderr"
echo "rc=$?"; tail -1 "$OUT/bench.json"; cat "$OUT/bench.stderr" | grep -E '^\{' | tail -8

step "2/5 MSM frontier (1M/2M/4M lanes)"
BENCH_FRONTIER=1 timeout 3000 python bench_windows.py >"$OUT/frontier.txt" 2>&1
echo "rc=$?"; tail -12 "$OUT/frontier.txt"

step "3/5 CLI test --engine jax (32bit example)"
W=/tmp/r3leg/cli; mkdir -p "$W"; cp /root/reference/examples/32bit/{schema,witness}.json "$W/"
(cd "$W" && timeout 1200 python -m bulletproofspp_tpu.cli test schema.json witness.json --engine jax) >"$OUT/cli_jax.txt" 2>&1
echo "rc=$?"; tail -4 "$OUT/cli_jax.txt"

step "4/5 CLI test --engine jax (rec_test: typed+conserved, mixed bases)"
cp /root/reference/examples/rec_test/{schema,witness}.json "$W/"
(cd "$W" && timeout 1200 python -m bulletproofspp_tpu.cli test schema.json witness.json --engine jax) >"$OUT/cli_jax_rec.txt" 2>&1
echo "rc=$?"; tail -4 "$OUT/cli_jax_rec.txt"
# NOTE: pytest slow suite is CPU-pinned by tests/conftest.py — the CPU
# slow-suite run is the parity leg; on-device validation is bench + CLI.

step "5/5 done — update PARITY_r03.json + BENCH_NOTES r3 table from $OUT"
