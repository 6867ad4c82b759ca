#!/bin/bash
# Fresh-machine round-3c serial TPU queue.
#
# The VM was recycled mid-round-3: git kept the code + TZA weight exports,
# but data/master_r2, data/slots_r3 and results/r3* checkpoints are gone.
# Every stage below is resumable (skips outputs that exist), so this one
# queue rebuilds the dataset pool, re-runs the bench-slot fine-tune early
# (so an improved flagship blob is committed even if later stages stall),
# then generates the expensive mesh masters and runs the keep-best
# campaign over all remaining slots.
#
# One job at a time: concurrent clients can wedge the axon TPU worker.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
set -x

run_watched() {  # run_watched <done-marker-regex> <log> <cmd...>
  local marker="$1" log="$2"; shift 2
  for i in $(seq 1 40); do
    "$@" >> "$log" 2>&1 &
    local cpid=$!
    # NOT `kill -0`: that succeeds on zombies, so the loop would spin for a
    # full watchdog period after every stage exits.
    while [ "$(ps -o stat= -p "$cpid" 2>/dev/null | tr -d ' ')" ] \
        && ! ps -o stat= -p "$cpid" 2>/dev/null | grep -q Z; do
      sleep 120
      if [ -z "$(find results data/master_r2 data/master_r2_dir weights -mmin -25 2>/dev/null | head -1)" ]; then
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

# Stage A: primitive + bench-scale masters (cheap; megakernel tier).
run_watched "ALLDONE"      /tmp/gen_r2.log      python scripts/gen_dataset_r2.py
run_watched "ALLDONE"      /tmp/noisy.log       python scripts/gen_noisy_extra.py 2
run_watched "ALLDONE"      /tmp/gen_r3b.log     python scripts/gen_dataset_r3b.py
run_watched "UPGRADE DONE" /tmp/upgrade.log     python scripts/upgrade_cleans_r3.py
run_watched "DIR UPGRADE DONE" /tmp/upgrade_dir.log python scripts/upgrade_dir_cleans_r3.py
python scripts/invalidate_slices_r3.py

# Stage B: bench-slot fine-tune on the upgraded primitive pool (keep-best);
# runs BEFORE the multi-hour mesh generation so the flagship improvement is
# banked early.
run_watched "SECOND_FT DONE" /tmp/second_ft.log python scripts/run_second_ft_r3.py 800 rt_ldr_alb

# Stage C: textured/mesh masters (the expensive part; hours).
run_watched "ALLDONE"      /tmp/gen_r3.log      python scripts/gen_dataset_r3.py
run_watched "MESH VALID UPGRADE DONE" /tmp/upgrade_mesh.log python scripts/upgrade_mesh_valid_r3.py
python scripts/invalidate_slices_r3.py

# Stage D: keep-best campaign over every slot on the full pool (device-
# resident plane cache; see run_campaign_r3c.py).
run_watched "CAMPAIGN DONE" /tmp/campaign_r3c.log python scripts/run_campaign_r3c.py
echo R3C_QUEUE_DONE
