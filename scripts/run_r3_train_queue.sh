#!/bin/bash
# Serial TPU queue: mesh/textured dataset -> round-3 fine-tune campaign.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
set -x
python scripts/gen_dataset_r3.py
python scripts/run_campaign_r3.py
echo TRAIN_QUEUE_DONE
