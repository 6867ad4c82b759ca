"""Round-5 final eval: held-out-pose RMSE/PSNR for every slot against the
upgraded ground truth -> results/r5_eval.json (fresh file).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/eval_r5.py
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import campaign_r2 as c2
from campaign_r3 import R3_SLOTS

c2.SLOTS_DIR = "data/slots_r3"
c2.RESULTS_DIR = "results/r5"  # -> results/r5_eval.json

if __name__ == "__main__":
    c2.stage_eval(R3_SLOTS + ["rtlightmap_dir"])
    print("ALLDONE", flush=True)
