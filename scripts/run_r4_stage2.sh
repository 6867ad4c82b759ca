#!/bin/bash
# Round-4 stage 2: waits for stage 1 (mesh masters + valid upgrade), then
# serializes the TPU queue: hardware probes (bounce megakernel parity+perf,
# sorted-wavefront impls, denoise benchmark matrix), the multi-pass
# keep-best denoiser campaign (deadline-driven), and the final eval.
#
# Usage: run_r4_stage2.sh <campaign_deadline_unix>
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

# Wait for stage 1 to release the chip (marker or its process gone).
while ! grep -q "R4_STAGE1_DONE" /tmp/r4_stage1.log 2>/dev/null; do
  if ! ps -o stat= -p "$(cat /tmp/r4_stage1.pid 2>/dev/null)" >/dev/null 2>&1; then
    break
  fi
  sleep 60
done
echo "stage 1 finished $(date +%H:%M:%S)" >&2

# Probes (short, serialized; each gets a bounded window).
wait_tunnel
timeout 2400 python scripts/probe_bounce_mega.py run > /tmp/probe_bounce_run.log 2>&1
wait_tunnel
timeout 2400 python scripts/probe_sort_impls.py 800 > /tmp/probe_sort.log 2>&1
wait_tunnel
timeout 1800 python -m mygpuraytracer_tpu.apps.benchmark --mode denoise --json \
  > /tmp/probe_denoise_bench.log 2>&1

# Campaign (multi-pass keep-best until the deadline).
echo "$CAMPAIGN_DEADLINE" > /tmp/r4_deadline
for i in $(seq 1 30); do
  if grep -q "R4 CAMPAIGN DONE" /tmp/campaign_r4.log 2>/dev/null; then break; fi
  if [ "$(date +%s)" -ge "$CAMPAIGN_DEADLINE" ]; then break; fi
  wait_tunnel
  python scripts/run_campaign_r4.py >> /tmp/campaign_r4.log 2>&1
  sleep 30
done

# Final eval (writes results/r4_eval.json via the campaign eval stage).
wait_tunnel
timeout 3600 python scripts/eval_r4.py > /tmp/final_eval_r4.log 2>&1
echo R4_STAGE2_DONE
