"""Second fine-tune of the bench slot (rt_ldr_alb) on the UPGRADED dataset.

The first r3 fine-tune trained against 2048/1024-spp targets whose residual
MC noise (0.029/0.042 display RMSE) dominates exactly at the bench's 800^2
scale. After scripts/upgrade_cleans_r3.py + the extended 800^2 pose set,
this warm-starts from the current exported TZA (NOT the r3 checkpoints —
their OneCycle is spent) into a fresh result dir, trains, exports, and
keeps whichever blob evals better against the upgraded ground truth.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/run_second_ft_r3.py [epochs] [slots-csv]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import campaign_r2 as c

c.SLOTS_DIR = "data/slots_r3"
c.RESULTS_DIR = "results/r3b"
c.INIT_DIR = "results/_tza_warm_start_only"  # no such dir -> TZA fallback
c.LR_SCALE = 0.5

EVAL_PATH = "results/r3b_eval.json"  # stage_eval derives from RESULTS_DIR


def eval_rmse(slot):
    c.stage_eval([slot])
    with open(EVAL_PATH) as fh:
        return json.load(fh)[slot]["rmse"]


if __name__ == "__main__":
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    slots = (sys.argv[2].split(",") if len(sys.argv) > 2 and sys.argv[2]
             else ["rt_ldr_alb"])
    t0 = time.time()
    c.stage_prep()
    print(f"prep done ({time.time()-t0:.0f}s)", flush=True)
    for slot in slots:
        done_flag = os.path.join(c.RESULTS_DIR, slot, "DONE")
        if os.path.exists(done_flag):
            print(f"### {slot} second-ft already done; skipping", flush=True)
            continue
        tza = os.path.join(c.WEIGHTS_DIR, f"{slot}.tza")
        keep = f"/tmp/pre_second_ft_{slot}.tza"
        if not os.path.exists(keep):
            shutil.copy(tza, keep)
        base = eval_rmse(slot)  # current blob vs UPGRADED ground truth
        print(f"### {slot} baseline vs upgraded GT: {base:.5f}", flush=True)
        t1 = time.time()
        c.stage_train([slot], epochs)
        new = eval_rmse(slot)
        print(f"### {slot} second-ft: {base:.5f} -> {new:.5f} "
              f"({time.time()-t1:.0f}s)", flush=True)
        verdict = "kept-new"
        if new > base:  # keep-best-of-rounds
            shutil.copy(keep, tza)
            final = eval_rmse(slot)  # restore the honest row
            verdict = f"restored-previous ({final:.5f})"
        with open(done_flag, "w") as f:
            f.write(f"{base:.5f} -> {new:.5f}; {verdict}\n")
        print(f"### {slot} {verdict}", flush=True)
    print(f"SECOND_FT DONE ({time.time()-t0:.0f}s)", flush=True)
