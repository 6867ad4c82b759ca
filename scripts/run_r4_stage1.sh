#!/bin/bash
# Round-4 stage 1: finish the mesh master pool (gen_dataset_r3 resumed —
# cottage poses + shipTex c4/valid were cut off by round 3's end), upgrade
# mesh validation cleans, invalidate stale slot slices. The round-3 VM
# survived into round 4, so the primitive pool + campaign checkpoints are
# already on disk and stages A/B of run_r4_bootstrap.sh are skipped.
#
# Usage: run_r4_stage1.sh <gen_end_unix>
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
set -x

GEN_END=${1:?gen hard-stop unix ts}

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

run_watched "ALLDONE" /tmp/gen_r3.log "$GEN_END" python scripts/gen_dataset_r3.py
run_watched "MESH VALID UPGRADE DONE" /tmp/upgrade_mesh.log "$GEN_END" python scripts/upgrade_mesh_valid_r3.py
python scripts/invalidate_slices_r3.py
echo R4_STAGE1_DONE
