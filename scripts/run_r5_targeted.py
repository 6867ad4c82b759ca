"""Round-5 targeted keep-best campaign: HDR laggards + bench slots first.

The full 12-slot pass (run_campaign_r5.py) costs more than the round-5
window allows alongside the evidence tasks (eval_r5, bench validation),
so this runs the slots VERDICT r4 names, in leverage order:

  - rt_hdr / rt_hdr_calb_cnrm: the two held-out laggards (32.99 / 33.10 dB
    vs the >=34 dB bar; results/r3c_eval.json);
  - rt_ldr_alb / rt_ldr_alb_nrm: they drive bench.py's headline RMSE keys
    (<=0.02 six-channel / <=0.015 nine-channel bars);
  - rt_hdr_alb: BASELINE config #5's slot;
  - rtlightmap_dir: now evaluated on 11 poses (gen_dir_valid_r5.py), give
    it one fine-tune visit too.

Keep-best (run_campaign_r3c.run) protects every committed blob: a visit
that evals worse restores the previous weights. Deadline via
/tmp/r5_deadline (unix seconds); remaining slots are skipped cleanly.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/run_r5_targeted.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import run_campaign_r3c as r3c

r3c.DEADLINE_FILE = "/tmp/r5_deadline"

PLAN = [
    ("rt_hdr", 1000),
    ("rt_hdr_calb_cnrm", 700),
    ("rt_ldr_alb", 600),
    ("rt_ldr_alb_nrm", 600),
    ("rt_hdr_alb", 600),
    ("rtlightmap_dir", 400),
    ("rt_ldr", 600),
    ("rt_ldr_calb_cnrm", 500),
    ("rt_hdr_alb_nrm", 500),
    ("rtlightmap_hdr", 400),
]


def main():
    t0 = time.time()
    for pass_idx in range(1, 9):
        if r3c.past_deadline():
            break
        r3c.c.RESULTS_DIR = f"results/r5_p{pass_idx}"
        os.makedirs(r3c.c.RESULTS_DIR, exist_ok=True)
        print(f"##### pass {pass_idx} -> {r3c.c.RESULTS_DIR}", flush=True)
        r3c.run(PLAN)
    print(f"R5 TARGETED CAMPAIGN DONE ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
