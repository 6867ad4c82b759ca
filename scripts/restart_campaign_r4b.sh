#!/bin/bash
# One-shot handover from the running pass-1 campaign (run_campaign_r4.py,
# old in-memory code) to run_campaign_r4b.py (fixed per-visit restore point
# + bench-critical slot order) at the pass-1/pass-2 boundary.
#
# Usage: restart_campaign_r4b.sh <old_campaign_pid> <new_deadline_unix>
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
set -x

OLD_PID=${1:?old campaign pid}
NEW_DEADLINE=${2:?new campaign deadline unix ts}

# 1. Wait for pass 1 to finish: its 12th slot is rt_ldr_alb (r3c.PLAN tail).
while [ ! -f results/r4_p1/rt_ldr_alb/DONE ]; do
  # If the old campaign died early, stop waiting and take over.
  if ! ps -p "$OLD_PID" > /dev/null 2>&1; then break; fi
  sleep 60
done

# 2. Stop the old process by exact pid (never by pattern).
kill "$OLD_PID" 2>/dev/null
sleep 10
kill -9 "$OLD_PID" 2>/dev/null

# 3. Health-gate: a killed TPU client can wedge the worker ~4 min.
until timeout 180 python - <<'EOF' 2>/dev/null | grep -q TUNNEL_OK
import jax, jax.numpy as jnp, numpy as np
y = jax.jit(lambda a: a * 2 + 1)(jnp.arange(16.0))
assert float(np.asarray(y[1])) == 3.0
print("TUNNEL_OK")
EOF
do
  echo "tunnel still wedged $(date +%H:%M:%S)" >&2
  sleep 120
done

# 4. Extend the deadline and run passes 2+ with the fixed keep-best.
echo "$NEW_DEADLINE" > /tmp/r4_deadline
python scripts/run_campaign_r4b.py >> /tmp/campaign_r4b.log 2>&1
echo "R4B_RESTART_DONE"
