#!/bin/bash
# Round-3 resume queue, phase 2: clean-target upgrade -> extended 800^2
# poses -> re-slice -> bench-slot second fine-tune -> remaining slots ->
# final full eval. Every stage is idempotent/resumable; the retry+watchdog
# wrapper handles both axon tunnel failure modes (broken-pipe crashes and
# silently hung requests — see run_r3_resume.sh).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
set -x

run_watched() {  # run_watched <done-marker-regex> <log> <cmd...>
  local marker="$1" log="$2"; shift 2
  for i in $(seq 1 40); do
    "$@" >> "$log" 2>&1 &
    local cpid=$!
    # NOT `kill -0`: that succeeds on zombies, so the loop would spin for a
    # full watchdog period after every stage exits (observed 2026-08-18).
    while [ "$(ps -o stat= -p "$cpid" 2>/dev/null | tr -d ' ')" ] \
        && ! ps -o stat= -p "$cpid" 2>/dev/null | grep -q Z; do
      sleep 120
      if [ -z "$(find results data/master_r2 weights -mmin -25 2>/dev/null | head -1)" ]; then
        echo "watchdog: no progress in 25 min; killing pid $cpid" >&2
        kill "$cpid" 2>/dev/null; sleep 10; kill -9 "$cpid" 2>/dev/null
        break
      fi
    done
    wait "$cpid"
    if grep -q "$marker" "$log"; then return 0; fi
    echo "attempt $i of '$*' ended unfinished; retrying in 60s" >&2
    sleep 60
  done
  return 1
}

run_watched "UPGRADE DONE"   /tmp/upgrade.log   python scripts/upgrade_cleans_r3.py
run_watched "ALLDONE"        /tmp/gen_r3b.log   python scripts/gen_dataset_r3b.py
python scripts/invalidate_slices_r3.py
run_watched "SECOND_FT DONE" /tmp/second_ft.log python scripts/run_second_ft_r3.py 800
run_watched "CAMPAIGN DONE"  /tmp/campaign.log  python scripts/run_campaign_r3.py
python scripts/campaign_r3.py eval > /tmp/final_eval.log 2>&1
echo TRAIN_QUEUE2_DONE
