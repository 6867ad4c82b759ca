#!/bin/bash
# Round-3d recovery queue: the axon TPU worker wedged mid-stage-C of the
# r3c queue (trivial jit hangs; every gen_dataset_r3 retry died silently).
# This queue first WAITS for tunnel health (one trivial jit every 3 min —
# a single client at a time, concurrent clients can wedge the worker),
# then resumes exactly where r3c stopped:
#   0. byte-gather perf probe (committed but never hardware-measured)
#   C. remaining mesh masters (resumable; skips existing outputs)
#   D. keep-best campaign over all slots
#   E. final 12-slot eval + bench.py preview
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
set -x

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

run_watched() {  # run_watched <done-marker-regex> <log> <cmd...>
  local marker="$1" log="$2"; shift 2
  if grep -q "$marker" "$log" 2>/dev/null; then return 0; fi
  for i in $(seq 1 40); do
    wait_tunnel
    "$@" >> "$log" 2>&1 &
    local cpid=$!
    while [ "$(ps -o stat= -p "$cpid" 2>/dev/null | tr -d ' ')" ] \
        && ! ps -o stat= -p "$cpid" 2>/dev/null | grep -q Z; do
      sleep 120
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
run_watched "PROBE DONE"   /tmp/probe_bytes.log python scripts/probe_byte_gathers.py

# Stage C (resumed): textured/mesh masters.
run_watched "ALLDONE"      /tmp/gen_r3.log      python scripts/gen_dataset_r3.py
run_watched "MESH VALID UPGRADE DONE" /tmp/upgrade_mesh.log python scripts/upgrade_mesh_valid_r3.py
python scripts/invalidate_slices_r3.py

# Stage D: keep-best campaign over every slot on the full pool.
run_watched "CAMPAIGN DONE" /tmp/campaign_r3c.log python scripts/run_campaign_r3c.py

# Stage E: final eval + bench preview.
run_watched "ALLDONE"      /tmp/final_eval_r3.log python scripts/campaign_r3.py eval
wait_tunnel
python bench.py > /tmp/bench_preview.log 2>&1
echo R3D_QUEUE_DONE
