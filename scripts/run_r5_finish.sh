#!/bin/bash
# Round-5 evidence chain: wait for the targeted campaign to finish, then
# produce the two artifacts VERDICT r4 asks for, serialized on the one chip:
#
#   1. results/r5_eval.json — held-out eval of ALL 12 slots (11 poses each,
#      including rtlightmap_dir's extended set) vs the upgraded GT;
#   2. a full bench.py validation run (the driver repeats it at round end;
#      this run proves the restructured phase-flushed form lands inside the
#      ~70 min envelope and records the numbers for README/STATUS).
#
# Usage: run_r5_finish.sh [campaign_pid]
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
set -x

CPID=${1:-$(cat /tmp/campaign.pid 2>/dev/null)}
if [ -n "$CPID" ]; then
  while kill -0 "$CPID" 2>/dev/null; do sleep 30; done
fi

python scripts/eval_r5.py 2>&1 | tee /tmp/eval_r5.log
timeout 5400 python bench.py > /tmp/bench_r5.log 2>/tmp/bench_r5.err
tail -1 /tmp/bench_r5.log
echo R5_FINISH_DONE
