#!/bin/bash
# Round-3 resume queue: (resumable) dataset generation + fine-tune campaign.
#
# Reliability shell around the axon tunnel, which exhibits BOTH failure
# modes on long campaigns (observed 2026-08-18):
#   - remote_compile "broken pipe" crashes  -> the retry loop relaunches;
#     train_device resumes each slot from its latest checkpoint and
#     prep/eval/gen are idempotent.
#   - silently LOST requests that hang the client forever (zero CPU, log
#     frozen) -> the watchdog kills the campaign when nothing under
#     results/r3 or weights/ has been touched for 25 min (long enough for
#     a cold slot's load+upload+compile), and the loop relaunches.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
set -x
python scripts/gen_dataset_r3.py
for i in $(seq 1 40); do
  python scripts/run_campaign_r3.py >> /tmp/campaign.log 2>&1 &
  cpid=$!
  while kill -0 "$cpid" 2>/dev/null; do
    sleep 120
    if [ -z "$(find results/r3 weights -mmin -25 2>/dev/null | head -1)" ]; then
      echo "watchdog: no progress in 25 min; killing campaign pid $cpid" >&2
      kill "$cpid" 2>/dev/null
      sleep 10
      kill -9 "$cpid" 2>/dev/null
      break
    fi
  done
  wait "$cpid"
  if grep -q "CAMPAIGN DONE" /tmp/campaign.log; then
    break
  fi
  echo "campaign attempt $i ended without finishing; retrying in 60s" >&2
  sleep 60
done
echo TRAIN_QUEUE_DONE
