#!/bin/bash
# Hardware validation backlog (see docs/PERF_NOTES.md "Pending hardware
# validation"). Run on a machine with the TPU tunnel up:
#   bash benchmarks/hw_backlog.sh [outdir]
# Each step is independently time-bounded; results land in $OUT.
set -u
OUT=${1:-/tmp/hw_backlog}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== 1. headline int8 bench =="
timeout 1800 python bench.py > "$OUT/bench_int8.json" 2> "$OUT/bench_int8.log"
tail -1 "$OUT/bench_int8.json"

echo "== 2. fp4 bench (native bitcast path) =="
timeout 1800 python bench.py --quant fp4 > "$OUT/bench_fp4.json" 2> "$OUT/bench_fp4.log"
tail -1 "$OUT/bench_fp4.json"

echo "== 3. int4 bench =="
timeout 1800 python bench.py --quant int4 > "$OUT/bench_int4.json" 2> "$OUT/bench_int4.log"
tail -1 "$OUT/bench_int4.json"

echo "== 4. parallel warmup timing (cold cache dir) =="
RTP_COMPILE_CACHE_DIR=$OUT/cc_seq timeout 1800 python bench.py \
    --decode-steps 16 > "$OUT/warmup_seq.json" 2>&1
RTP_COMPILE_CACHE_DIR=$OUT/cc_par RTP_PARALLEL_WARMUP=8 timeout 1800 \
    python bench.py --decode-steps 16 > "$OUT/warmup_par.json" 2>&1
grep -o '"warmup_s": [0-9.]*' "$OUT/warmup_seq.json" "$OUT/warmup_par.json"

echo "== 5. pallas prefill kernel parity + TTFT =="
RTP_ENABLE_PALLAS_PREFILL=1 timeout 1800 python bench.py \
    --decode-steps 16 > "$OUT/bench_pallas_prefill.json" 2> "$OUT/pp.log"
grep -o '"ttft_p50_ms": [0-9.]*' "$OUT/bench_int8.json" \
    "$OUT/bench_pallas_prefill.json"

echo "== 6. serving under load =="
timeout 2400 python benchmarks/serve_bench.py --num-prompts 128 \
    --request-rate 8 > "$OUT/serve.json" 2> "$OUT/serve.log"
tail -1 "$OUT/serve.json"

echo "done; results in $OUT"
