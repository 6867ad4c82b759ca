#!/bin/bash
# Round-4 campaign EXTENSION: when the finishing chain (run_r4_final.sh)
# prints R4_FINAL_DONE with session wall-clock left, convert that slack
# into more keep-best passes, then refresh the round artifacts.
#
# Safe to run repeatedly: passes resume via per-slot DONE flags (a pass
# whose slots are all DONE skips in seconds), keep-best makes every slot
# visit monotone, and eval/bench just overwrite their artifacts.
#
# Usage: extend_r4.sh <campaign_deadline_unix>
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
set -x

CAMPAIGN_DEADLINE=${1:?campaign deadline unix ts}

tunnel_ok() {
  timeout 180 python - <<'EOF' 2>/dev/null | grep -q TUNNEL_OK
import jax, jax.numpy as jnp, numpy as np
y = jax.jit(lambda a: a * 2 + 1)(jnp.arange(16.0))
assert float(np.asarray(y[1])) == 3.0
print("TUNNEL_OK")
EOF
}

wait_tunnel() {
  until tunnel_ok; do
    echo "tunnel still wedged $(date +%H:%M:%S)" >&2
    sleep 180
  done
  echo "tunnel healthy $(date +%H:%M:%S)" >&2
}

run_watched() {  # run_watched <done-marker-regex> <log> <end-ts-or-0> <cmd...>
  local marker="$1" log="$2" end_ts="$3"; shift 3
  if grep -q "$marker" "$log" 2>/dev/null; then return 0; fi
  for i in $(seq 1 40); do
    if [ "$end_ts" != 0 ] && [ "$(date +%s)" -ge "$end_ts" ]; then
      echo "stage window over for '$*'; moving on" >&2
      return 0
    fi
    wait_tunnel
    "$@" >> "$log" 2>&1 &
    local cpid=$!
    while [ "$(ps -o stat= -p "$cpid" 2>/dev/null | tr -d ' ')" ] \
        && ! ps -o stat= -p "$cpid" 2>/dev/null | grep -q Z; do
      sleep 120
      if [ "$end_ts" != 0 ] && [ "$(date +%s)" -ge "$end_ts" ]; then
        echo "stage window over; killing pid $cpid" >&2
        kill "$cpid" 2>/dev/null; sleep 10; kill -9 "$cpid" 2>/dev/null
        wait "$cpid"
        return 0
      fi
      if [ -z "$(find results data/master_r2 data/master_r2_dir weights "$log" -mmin -25 2>/dev/null | head -1)" ]; then
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

echo "$CAMPAIGN_DEADLINE" > /tmp/r4_deadline
# Log is keyed by deadline: a stale "R4 CAMPAIGN DONE" from an earlier
# extension in a shared log would make run_watched skip this one entirely.
run_watched "R4 CAMPAIGN DONE" "/tmp/campaign_r4ext_${CAMPAIGN_DEADLINE}.log" \
  "$CAMPAIGN_DEADLINE" python scripts/run_campaign_r4b.py

rm -f /tmp/final_eval_r4b.log
run_watched "ALLDONE" /tmp/final_eval_r4b.log 0 python scripts/eval_r4.py
wait_tunnel
timeout 4000 python bench.py > /tmp/bench_preview2.log 2>&1
echo R4_EXTEND_DONE
