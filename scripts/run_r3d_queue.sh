#!/bin/bash
# Round-3d recovery queue: the axon TPU worker wedged mid-stage-C of the
# r3c queue (trivial jit hangs; every gen_dataset_r3 retry died silently).
#
# Differences from run_r3c_queue.sh:
# - every stage attempt is gated on a trivial-jit tunnel health check so
#   retries stop burning while the worker is down (one client at a time —
#   concurrent clients can wedge the worker);
# - REORDERED: the keep-best campaign runs on the EXISTING pool (primitives
#   upgraded + shipTex c0) BEFORE the multi-hour mesh generation, so the
#   driver-visible eval/bench improvements are banked even if the tunnel
#   outage ate the gen window. Mesh masters then extend the pool for a
#   second pass / next round.
# - time-aware: stages carry hard end times derived from the driver round
#   clock (12 h from driver start; ~45 min reserved for final eval+bench).
#
# Usage: run_r3d_queue.sh <campaign_deadline_unix> <gen_end_unix>
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
set -x

CAMPAIGN_DEADLINE=${1:?campaign deadline unix ts}
GEN_END=${2:?gen hard-stop unix ts}

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
      # The stage log counts as progress: eval/train stages print per slot
      # but only write results/ at the end; a wedged-tunnel child prints
      # nothing, so the watchdog still fires on a true hang.
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

# Stage 0: quick perf probe of the byte-packed gathers (minutes).
run_watched "PROBE DONE"   /tmp/probe_bytes.log 0 python scripts/probe_byte_gathers.py

# Stage 1: keep-best campaign over every slot on the existing pool. The
# campaign reads /tmp/r3c_deadline itself and skips remaining slots cleanly.
echo "$CAMPAIGN_DEADLINE" > /tmp/r3c_deadline
run_watched "CAMPAIGN DONE" /tmp/campaign_r3c.log "$CAMPAIGN_DEADLINE" python scripts/run_campaign_r3c.py

# Stage 2: mid-queue eval snapshot (cheap insurance if gen eats the rest).
run_watched "ALLDONE"      /tmp/final_eval_r3.log 0 python scripts/campaign_r3.py eval

# Stage 3: remaining mesh masters (resumable; per-pose checkpoints survive
# the hard stop, so whatever finishes enriches the pool for round 4).
run_watched "ALLDONE"      /tmp/gen_r3.log "$GEN_END" python scripts/gen_dataset_r3.py
run_watched "MESH VALID UPGRADE DONE" /tmp/upgrade_mesh.log "$GEN_END" python scripts/upgrade_mesh_valid_r3.py
python scripts/invalidate_slices_r3.py

# Stage 4: bench preview so BENCH_r03-shaped numbers exist before the
# driver's official run.
wait_tunnel
timeout 3000 python bench.py > /tmp/bench_preview.log 2>&1
echo R3D_QUEUE_DONE
