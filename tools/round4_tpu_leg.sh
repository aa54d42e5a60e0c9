#!/bin/bash
# Round-4 TPU validation leg.  ONE TPU process at a time (single-tenant
# chip).  Logs to /tmp/r4leg.
#
# Ordering per VERDICT r3 item 4: the CLI correctness legs run FIRST with
# their own timeouts so a bench timeout can never starve the round's
# correctness evidence (round-3 regression: BENCH_FULL consumed the whole
# 3000 s window and steps 3-5 never ran).
set -u
OUT=/tmp/r4leg
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

step() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }

step "1/6 CLI test --engine jax (32bit example)"
W="$OUT/cli"; mkdir -p "$W"
cp /root/reference/examples/32bit/{schema,witness}.json "$W/"
(cd "$W" && timeout 1200 python -m bulletproofspp_tpu.cli test schema.json witness.json --engine jax) >"$OUT/cli_jax_32bit.txt" 2>&1
echo "rc=$?"; tail -4 "$OUT/cli_jax_32bit.txt"

step "2/6 CLI test --engine jax (rec_test: typed+conserved, mixed bases)"
cp /root/reference/examples/rec_test/{schema,witness}.json "$W/"
(cd "$W" && timeout 1200 python -m bulletproofspp_tpu.cli test schema.json witness.json --engine jax) >"$OUT/cli_jax_rec.txt" 2>&1
echo "rc=$?"; tail -4 "$OUT/cli_jax_rec.txt"

step "3/6 bench (headline, median-of-5)"
timeout 1800 python bench.py >"$OUT/bench.json" 2>"$OUT/bench.stderr"
echo "rc=$?"; tail -1 "$OUT/bench.json"; grep -E '^\{' "$OUT/bench.stderr" | tail -8

step "4/6 bench FULL (kernel ns/lane + serve + 1024-batch)"
BENCH_FULL=1 timeout 2400 python bench.py >"$OUT/bench_full.json" 2>"$OUT/bench_full.stderr"
echo "rc=$?"; tail -1 "$OUT/bench_full.json"; grep -E '^\{' "$OUT/bench_full.stderr" | tail -8

step "5/6 MSM frontier (1M/2M/4M lanes; validates _SCRATCH_TABLE_MIN_L)"
BENCH_FRONTIER=1 timeout 2400 python bench_windows.py >"$OUT/frontier.txt" 2>&1
echo "rc=$?"; tail -12 "$OUT/frontier.txt"

step "6/6 single-stream prove latency (VERDICT r3 item 7 target: >=3/s)"
timeout 900 python tools/prove_latency.py >"$OUT/prove_latency.txt" 2>&1
echo "rc=$?"; tail -6 "$OUT/prove_latency.txt"

echo "done — update PARITY_r04.json + BENCH_NOTES r4 table from $OUT"
