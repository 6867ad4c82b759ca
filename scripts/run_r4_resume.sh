#!/bin/bash
# Round-4 mid-round resume queue (session 3 of round 4).
#
# State when this replaces run_r4_bootstrap2.sh: stages A-C all carry their
# done markers (gen_r2/noisy/gen_r3b/upgrade/upgrade_dir/second_ft/gen_r3)
# but the old shell's windows were sized for a session that ended — the
# mesh-valid GT upgrade would be cut and the keep-best campaign (stage D,
# not yet run this round: no results/r4_p*) would get only ~2 h. This queue
# re-runs the tail with windows sized to the fresh ~12 h session, and takes
# the round-5 plan's stage-0 oct probe first (15 min, decides the TPU
# winner_table default while the tunnel is fresh).
#
# Usage: run_r4_resume.sh <gen_end_unix> <campaign_deadline_unix>
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
set -x

GEN_END=${1:?gen hard-stop unix ts}
CAMPAIGN_DEADLINE=${2:?campaign deadline unix ts}

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
    # NOT `kill -0`: that succeeds on zombies.
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

# Stage 0: oct winner-table probe (~15 min; decides the TPU default).
run_watched "PROBE DONE"   /tmp/probe_oct.log "$GEN_END" python scripts/probe_winner_oct.py

# Stage C tail: mesh-scene valid GT upgrade (chunked, prints progress).
run_watched "MESH VALID UPGRADE DONE" /tmp/upgrade_mesh.log "$GEN_END" python scripts/upgrade_mesh_valid_r3.py
python scripts/invalidate_slices_r3.py

# Stage D: keep-best campaign over every slot on the full pool.
echo "$CAMPAIGN_DEADLINE" > /tmp/r4_deadline
run_watched "R4 CAMPAIGN DONE" /tmp/campaign_r4.log "$CAMPAIGN_DEADLINE" python scripts/run_campaign_r4.py

# Stage E: final eval + bench preview.
run_watched "ALLDONE"      /tmp/final_eval_r4.log 0 python scripts/eval_r4.py
wait_tunnel
timeout 3000 python bench.py > /tmp/bench_preview.log 2>&1
echo R4_RESUME_DONE
