#!/bin/bash
# Round-4 final-session queue (session 6): the VM was wiped MID-ROUND, so
# the master pool + results/* are gone while weights/ carries the banked
# pass-1 (+ partial pass-2) keep-best winners. Regenerate the pool, then
# resume the keep-best campaign at pass 2 (run_campaign_r4b: bench-critical
# slots first; keep-best makes re-training from the banked blobs monotone),
# then produce the round artifacts results/r4_eval.json + a bench preview.
#
# Every stage is resumable (skips outputs that exist), serialized (one TPU
# client at a time), health-gated and time-boxed.
#
# Usage: run_r4_final.sh <gen_end_unix> <campaign_deadline_unix>
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

# Stage A: primitive + bench-scale masters (megakernel tier; ~1-2 h).
run_watched "ALLDONE"      /tmp/gen_r2.log    "$GEN_END" python scripts/gen_dataset_r2.py
run_watched "ALLDONE"      /tmp/noisy.log     "$GEN_END" python scripts/gen_noisy_extra.py 2
run_watched "ALLDONE"      /tmp/gen_r3b.log   "$GEN_END" python scripts/gen_dataset_r3b.py
run_watched "UPGRADE DONE" /tmp/upgrade.log   "$GEN_END" python scripts/upgrade_cleans_r3.py
run_watched "DIR UPGRADE DONE" /tmp/upgrade_dir.log "$GEN_END" python scripts/upgrade_dir_cleans_r3.py
python scripts/invalidate_slices_r3.py

# Stage B: textured/mesh masters (the expensive part; hours).
run_watched "ALLDONE"      /tmp/gen_r3.log    "$GEN_END" python scripts/gen_dataset_r3.py
run_watched "MESH VALID UPGRADE DONE" /tmp/upgrade_mesh.log "$GEN_END" python scripts/upgrade_mesh_valid_r3.py
python scripts/invalidate_slices_r3.py

# Stage C: keep-best campaign, passes 2+ (bench-critical slots head each
# pass; reads /tmp/r4_deadline itself).
echo "$CAMPAIGN_DEADLINE" > /tmp/r4_deadline
run_watched "R4 CAMPAIGN DONE" /tmp/campaign_r4b.log "$CAMPAIGN_DEADLINE" python scripts/run_campaign_r4b.py

# Stage D: final eval + bench preview.
run_watched "ALLDONE"      /tmp/final_eval_r4.log 0 python scripts/eval_r4.py
wait_tunnel
timeout 4000 python bench.py > /tmp/bench_preview.log 2>&1
echo R4_FINAL_DONE
