#!/bin/bash
# Round-5 fresh-machine bootstrap queue.
#
# The VM is wiped between rounds (only git survives): data/master_r2*,
# data/slots_r3 and results/* are gone at round start and must be
# regenerated before any training. Every stage is resumable (skips
# outputs that exist), serialized (one TPU client at a time — concurrent
# clients can wedge the axon worker), health-gated (trivial-jit check
# before each attempt) and time-boxed (args give hard end times derived
# from the driver's 12 h round clock; reserve ~45 min for eval + bench).
#
# Round-5 ordering notes:
# - The oct winner-table probe RAN in round-4 session 3 (2.213 vs f16's
#   2.137 Msam/s, drift 6e-6 — docs/MESH_TIERS.md) and the TPU default is
#   already oct; no probe stage remains.
# - Whether to re-run the full campaign depends on where results/r4_eval
#   landed (committed at end of round 4); if the bench RMSE bars
#   (<=0.02 6-ch / <=0.015 9-ch) are already met, prefer spending the
#   window on targeted laggard slots (rt_hdr) over another full pass.
#
# Usage: run_r5_bootstrap.sh <gen_end_unix> <campaign_deadline_unix>
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

# Stage B: bank a flagship fine-tune on the primitive pool early.
run_watched "SECOND_FT DONE" /tmp/second_ft.log "$GEN_END" python scripts/run_second_ft_r3.py 800 rt_ldr_alb

# Stage C: textured/mesh masters (the expensive part; hours).
run_watched "ALLDONE"      /tmp/gen_r3.log    "$GEN_END" python scripts/gen_dataset_r3.py
run_watched "MESH VALID UPGRADE DONE" /tmp/upgrade_mesh.log "$GEN_END" python scripts/upgrade_mesh_valid_r3.py
python scripts/invalidate_slices_r3.py

# Stage D: keep-best campaign over every slot on the full pool
# (device-resident plane cache; reads /tmp/r5_deadline itself).
echo "$CAMPAIGN_DEADLINE" > /tmp/r5_deadline
run_watched "R5 CAMPAIGN DONE" /tmp/campaign_r5.log "$CAMPAIGN_DEADLINE" python scripts/run_campaign_r5.py

# Stage E: final eval + bench preview.
run_watched "ALLDONE"      /tmp/final_eval_r5.log 0 python scripts/eval_r5.py
wait_tunnel
timeout 3000 python bench.py > /tmp/bench_preview.log 2>&1
echo R5_BOOTSTRAP_DONE
