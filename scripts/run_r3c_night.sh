#!/bin/bash
# Post-queue sequence: waits for the round-3c queue to exit, then uses the
# now-free chip for (1) the byte-gather perf probe, (2) the final full
# 12-slot eval into results/r3_eval.json, and (3) a full bench.py preview
# so BENCH_r03-shaped numbers exist before the driver's official run.
# Serialized behind the queue so nothing contends with training dispatches.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
set -x

QPID=$(cat /tmp/r3c_queue.pid)
while [ -n "$(ps -o stat= -p "$QPID" 2>/dev/null | tr -d ' ')" ]; do
  sleep 60
done

python scripts/probe_byte_gathers.py > /tmp/probe_bytes.log 2>&1
python scripts/campaign_r3.py eval > /tmp/final_eval_r3.log 2>&1
python bench.py > /tmp/bench_preview.log 2>&1
echo NIGHT_DONE
