"""Round-3 denoiser campaign: fine-tune every slot on the enlarged
(mesh/textured-scene) dataset, warm-starting from the round-2 checkpoints.

Thin driver over campaign_r2's stages with round-3 locations:
    prep   — slice the ENLARGED data/master_r2 pool into data/slots_r3
    train  — fine-tune (INIT_DIR=results/r2, fresh OneCycle at a lower
             peak) into results/r3, export weights/<slot>.tza
    eval   — held-out-pose RMSE/PSNR -> results/r3_eval.json

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/campaign_r3.py <stage> [slots-csv] [epochs]
"""

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import campaign_r2 as c2

c2.SLOTS_DIR = "data/slots_r3"
c2.RESULTS_DIR = "results/r3"
c2.INIT_DIR = "results/r2"
c2.LR_SCALE = 0.5  # gentler OneCycle when warm-starting from r2 weights

# Slots ordered by leverage: the bench slot first, then the aux prefilters
# (they feed calb/cnrm and --prefilter_aux), then HDR/LDR mains, then the
# wide tiers, lightmap last (its dataset is unchanged from round 2).
R3_SLOTS = [
    "rt_ldr_alb", "rt_alb", "rt_nrm", "rt_hdr_alb", "rt_ldr", "rt_hdr",
    "rt_ldr_alb_nrm", "rt_hdr_alb_nrm", "rt_ldr_calb_cnrm",
    "rt_hdr_calb_cnrm", "rtlightmap_hdr",
]


if __name__ == "__main__":
    stage = sys.argv[1]
    slots = sys.argv[2].split(",") if len(sys.argv) > 2 and sys.argv[2] else R3_SLOTS
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    if stage == "prep":
        c2.stage_prep()
    elif stage == "train":
        c2.stage_train(slots, epochs)
    elif stage == "eval":
        c2.stage_eval(slots + ["rtlightmap_dir"])
    else:
        raise SystemExit(f"unknown stage {stage}")
    print("ALLDONE", flush=True)
