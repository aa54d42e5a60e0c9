#!/bin/bash
# Round-5 TPU validation leg.  ONE TPU process at a time (single-tenant
# chip).  Logs to /tmp/r5leg.
#
# CLI correctness legs run FIRST with their own timeouts (a bench timeout
# must never starve correctness evidence).  ADVICE r4 fixes: per-leg
# workdirs (no cross-leg schema clobbering), every step's rc feeds the
# script's exit status, cd/cp failures abort loudly.
set -u
OUT=/tmp/r5leg
mkdir -p "$OUT"
cd /root/repo || exit 1
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
RC=0
note() { r=$1; [ "$r" -gt "$RC" ] && RC=$r; echo "rc=$r (worst=$RC)"; }
step() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }

step "1/8 CLI test --engine jax (32bit example)"
W="$OUT/cli_32bit"; mkdir -p "$W"
cp /root/reference/examples/32bit/{schema,witness}.json "$W/" || { echo "copy failed"; exit 1; }
(cd "$W" && timeout 1200 python -m bulletproofspp_tpu.cli test schema.json witness.json --engine jax) >"$OUT/cli_jax_32bit.txt" 2>&1
note $?; tail -4 "$OUT/cli_jax_32bit.txt"

step "2/8 CLI test --engine jax (rec_test: typed+conserved, mixed bases)"
W="$OUT/cli_rec"; mkdir -p "$W"
cp /root/reference/examples/rec_test/{schema,witness}.json "$W/" || { echo "copy failed"; exit 1; }
(cd "$W" && timeout 2400 python -m bulletproofspp_tpu.cli test schema.json witness.json --engine jax) >"$OUT/cli_jax_rec.txt" 2>&1
note $?; tail -4 "$OUT/cli_jax_rec.txt"

step "3/8 bench (headline, median-of-5, cached-table MSM)"
timeout 1800 python bench.py >"$OUT/bench.json" 2>"$OUT/bench.stderr"
note $?; tail -1 "$OUT/bench.json"; grep -E '^\{' "$OUT/bench.stderr" | tail -8

step "4/8 bench proofs+mixed (prove/verify/lockstep rates)"
BENCH_ONLY=proofs,mixed timeout 2400 python bench.py >"$OUT/bench_proofs.json" 2>"$OUT/bench_proofs.stderr"
note $?; grep -E '^\{' "$OUT/bench_proofs.stderr" | tail -4

step "5/8 bench serve (TPU dynamic batching — the r5 PENDING leg)"
BENCH_ONLY=serve timeout 2400 python bench.py >"$OUT/bench_serve.json" 2>"$OUT/bench_serve.stderr"
note $?; grep -E '^\{' "$OUT/bench_serve.stderr" | tail -2

step "6/8 bench batch-1024 (merged-MSM verification showcase)"
BENCH_ONLY=batch timeout 1800 python bench.py >"$OUT/bench_batch.json" 2>"$OUT/bench_batch.stderr"
note $?; grep -E '^\{' "$OUT/bench_batch.stderr" | tail -2

step "7/8 MSM frontier (1M/2M/4M lanes; validates _SCRATCH_TABLE_MIN_L)"
BENCH_FRONTIER=1 timeout 2400 python bench_windows.py >"$OUT/frontier.txt" 2>&1
note $?; tail -12 "$OUT/frontier.txt"

step "8/8 single-stream prove latency (target: >=3/s)"
timeout 900 python tools/prove_latency.py >"$OUT/prove_latency.txt" 2>&1
note $?; tail -6 "$OUT/prove_latency.txt"

echo "done (worst rc=$RC) — update PARITY_r05.json + BENCH_NOTES r5 table from $OUT"
exit $RC
