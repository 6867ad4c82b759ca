#!/bin/bash
# Round-3 resume queue: DMA hardware probe, then the (resumable) dataset
# generation + fine-tune campaign. One serialized TPU pipeline.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
set -x
timeout 3600 python scripts/probe_rows_dma.py
python scripts/gen_dataset_r3.py
python scripts/run_campaign_r3.py
echo TRAIN_QUEUE_DONE
