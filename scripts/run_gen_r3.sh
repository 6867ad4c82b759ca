#!/bin/bash
# Serial TPU queue for the round-3 dataset regeneration.
#
# The training masters live outside git (data/master_r2): a fresh machine
# keeps only the committed weights, so the denoiser campaign must re-render
# its dataset. Every stage is resumable (each skips outputs that exist).
# One job at a time: concurrent clients can wedge the axon TPU worker, and
# the probe stage needs uncontended timings.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
set -x
python scripts/probe_tiers_r3.py
python scripts/gen_dataset_r2.py
python scripts/gen_noisy_extra.py 2
python scripts/gen_dataset_r3b.py
echo QUEUE_DONE
