#!/usr/bin/env bash
# Regenerate every performance number on the real chip, in one command.
# Each step prints its own results; see docs/RESULTS.md for the recorded
# values and context. Run from the repo root on a machine with the axon
# TPU relay up (bench.py exits 1 fast if it is down).
set -uo pipefail
cd "$(dirname "$0")/.."
# scripts/*.py run with sys.path[0]=scripts/ — put the repo root first
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

echo "=== bench.py (headline: MMoE train examples/sec/chip) ==="
python bench.py || exit 1

echo "=== inference (scanned eval forward) ==="
python scripts/bench_infer.py || true

echo "=== serving (AOT Predictor, f32/bf16/int8 tables) ==="
python scripts/bench_serve.py || true

echo "=== exact vs streaming eval at 1M rows ==="
python scripts/bench_eval_streaming.py || true

echo "=== end-to-end epoch (device-resident, 1M rows) ==="
python scripts/profile_epoch.py || true

echo "=== CDC full matrix update (50 domains) ==="
python scripts/profile_cdc_update.py || true

echo "=== scaling (virtual mesh; --real when multi-chip exists) ==="
python scripts/bench_scaling.py || true
