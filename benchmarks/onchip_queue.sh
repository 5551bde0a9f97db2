#!/bin/bash
# One-stop runner for everything queued during the TPU tunnel outage
# (docs/perf_journal.md "queued for the next on-chip window" lists).
# Sequential on purpose — NEVER run two TPU processes at once (the tunnel
# serializes them and both crawl). Each step is bounded by timeout so a
# hung backend can't eat the window; logs land in benchmarks/onchip_logs/.
#
# Usage:  bash benchmarks/onchip_queue.sh
set -uo pipefail
cd "$(dirname "$0")/.."
L=benchmarks/onchip_logs
mkdir -p "$L"

run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a "$L/queue.log"
  timeout 1750 "$@" 2>&1 | tee "$L/$name.log" | tail -5
  echo "=== $name exit: $?" | tee -a "$L/queue.log"
}

# 0. is the chip even up? (fails fast if the backend errors)
run probe python -c "import jax; print(jax.devices())"

# 1. numerics: the /verify flow, scripted (oracle gates, both disciplines,
#    kv-quant, ragged, grads)
run verify python benchmarks/onchip_verify.py

# 2. headline (median-of-3 chained delta timing; writes the JSON line)
run headline python bench.py

# 3. the full ladder incl. the long-seq roofline gate rungs and the new
#    int8xint8 GEMM rung; isolated so one worker crash can't kill the rest
echo "=== ladder (long, isolated; own timeout per rung)" | tee -a "$L/queue.log"
timeout 5400 python benchmarks/run_all.py --long --isolated \
    --out benchmarks/results_onchip.json 2>&1 | tee "$L/ladder.log" | tail -25

# 4. decode + serving throughput
run decode_bf16 python benchmarks/bench_decode.py --batch 8
run decode_int8 python benchmarks/bench_decode.py --batch 8 --int8 --int8-weights
run serving_linear python benchmarks/bench_serving.py --backend linear
run serving_paged python benchmarks/bench_serving.py --backend paged
run serving_chunked python benchmarks/bench_serving.py --backend paged --prefill-chunk 256
run serving_ms8 python benchmarks/bench_serving.py --multi-step 8
run spec_k4 python benchmarks/bench_spec.py --spec-k 4

echo "queue complete; journal the numbers into docs/perf_journal.md"
