#!/bin/bash
# Round-6+ fresh-machine bootstrap — the POST-ARCHIVE fast path.
#
# Since round 5 the full master pool ships IN GIT as a fp16 archive
# (data/master_pack, ~234 MB; scripts/pack_masters_r5.py), so a cold
# checkout restores the ~3 GB training pool in minutes of CPU time
# instead of the multi-hour TPU regen that round 4/5 paid:
#
#   1. python scripts/pack_masters_r5.py unpack      (~3 min, CPU)
#   2. python - <<'PY'                               (slot slices, CPU)
#      import sys; sys.path.insert(0,'scripts'); import campaign_r2 as c2
#      c2.SLOTS_DIR='data/slots_r3'; c2.stage_prep()
#      PY
#   3. keep-best campaign / eval immediately (TPU)
#
# The fp32 gen scripts (gen_dataset_r2/r3b/gen_noisy_extra + upgrades)
# remain the path for GT *upgrades* only — run them when a round's goal
# is better ground truth, not as a precondition for training.
#
# Usage: run_r6_bootstrap.sh <campaign_deadline_unix>
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
set -x

CAMPAIGN_DEADLINE=${1:?campaign deadline unix ts}

python scripts/pack_masters_r5.py unpack
python - <<'PY'
import sys
sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/scripts')
import campaign_r2 as c2
c2.SLOTS_DIR = 'data/slots_r3'
c2.stage_prep()
print('PREP DONE')
PY

echo "$CAMPAIGN_DEADLINE" > /tmp/r5_deadline
timeout $(( CAMPAIGN_DEADLINE - $(date +%s) + 600 )) \
  python scripts/run_r5_targeted.py 2>&1 | tee /tmp/campaign.log
python scripts/eval_r5.py 2>&1 | tee /tmp/final_eval.log
echo R6_BOOTSTRAP_DONE
