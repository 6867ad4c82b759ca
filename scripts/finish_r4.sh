#!/bin/bash
# Round-4 finishing chain: wait for the keep-best campaign handover to
# complete (restart_campaign_r4b.sh prints R4B_RESTART_DONE after the
# campaign's own R4 CAMPAIGN DONE), then produce the round artifacts:
# results/r4_eval.json (held-out eval of every slot) and a bench preview.
#
# Usage: finish_r4.sh <restart_log>
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
set -x

RESTART_LOG=${1:?restart log path}

while ! grep -q "R4B_RESTART_DONE" "$RESTART_LOG" 2>/dev/null; do
  sleep 120
done

tunnel_ok() {
  timeout 180 python - <<'EOF' 2>/dev/null | grep -q TUNNEL_OK
import jax, jax.numpy as jnp, numpy as np
y = jax.jit(lambda a: a * 2 + 1)(jnp.arange(16.0))
assert float(np.asarray(y[1])) == 3.0
print("TUNNEL_OK")
EOF
}
until tunnel_ok; do echo "tunnel wedged $(date +%H:%M:%S)" >&2; sleep 120; done

timeout 3600 python scripts/eval_r4.py > /tmp/final_eval_r4.log 2>&1

until tunnel_ok; do echo "tunnel wedged $(date +%H:%M:%S)" >&2; sleep 120; done

timeout 4000 python bench.py > /tmp/bench_preview_r4.log 2>&1
echo "R4_FINISH_DONE"
