#!/bin/bash
# Sequential TPU experiment queue (one TPU user at a time; run under
# nohup, tail /tmp/tpu_queue.log). Order: kernel A/Bs first (they decide
# whether to keep the working-tree kernel), then probes, then the new
# bench cases.
set -x
LOG=/tmp/tpu_queue.log
exec >> "$LOG" 2>&1
cd /root/repo

echo "=== queue start $(date +%T) ==="
echo "=== 1. A/B: HEAD (masked-sum) vs working tree (register-q) ==="
timeout 1200 python scripts/ab_pipeline.py
echo "=== 2. A/B: pre-masked-sum (f01e792~1) vs working tree ==="
timeout 1200 python scripts/ab_pipeline.py "f01e792~1"
echo "=== 3. DIA 2M probe ==="
timeout 1200 python scripts/probe_dia_2m.py
echo "=== 3b. tier-2 fori unroll sweep (powerlaw) ==="
timeout 1500 python scripts/probe_tier2_unroll.py
echo "=== 4. new bench cases standalone (banded20M, df64) ==="
timeout 1800 python -m benchmark_spmv_using_csr5_tpu.bench.case_runner banded20M df64_banded500k
echo "=== 5. full bench.py shakedown (must land all 12 cases in budget) ==="
timeout 1500 python bench.py
echo "=== queue done $(date +%T) ==="
