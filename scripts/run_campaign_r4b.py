"""Round-4 keep-best campaign, passes 2+: bench-critical slots first.

Same machinery as run_campaign_r4.py (keep-best, device-resident plane
cache, per-slot DONE flags, fresh results dir per pass, /tmp/r4_deadline),
with the slot ORDER changed: the two slots that drive bench.py's headline
RMSE keys (rt_ldr_alb -> rmse_ldr_denoised_16spp, rt_ldr_alb_nrm -> the
9-channel key) train at the HEAD of each pass so a deadline cut can only
cost the tail slots. Aux prefilters (rt_alb/rt_nrm) still precede the
calb/cnrm slots whose eval chains through them.

Run AFTER pass 1 (run_campaign_r4.py) has banked results/r4_p1; passes here
start at r4_p2. Requires the fixed per-visit restore point in
run_campaign_r3c.run (a stale restore point would discard pass-1 gains on
a pass-2 regression).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_campaign_r4b.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import run_campaign_r3c as r3c

r3c.DEADLINE_FILE = "/tmp/r4_deadline"

PLAN = [
    ("rt_ldr_alb", 600),
    ("rt_ldr_alb_nrm", 600),
    ("rt_ldr", 700),
    ("rt_hdr_alb", 800),
    ("rt_hdr", 700),
    ("rt_alb", 500),
    ("rt_nrm", 400),
    ("rt_hdr_alb_nrm", 600),
    ("rt_ldr_calb_cnrm", 500),
    ("rt_hdr_calb_cnrm", 500),
    ("rtlightmap_hdr", 400),
    ("rtlightmap_dir", 400),
]


def main():
    t0 = time.time()
    for pass_idx in range(2, 9):
        if r3c.past_deadline():
            break
        r3c.c.RESULTS_DIR = f"results/r4_p{pass_idx}"
        os.makedirs(r3c.c.RESULTS_DIR, exist_ok=True)
        print(f"##### pass {pass_idx} -> {r3c.c.RESULTS_DIR}", flush=True)
        r3c.run(PLAN)
    print(f"R4 CAMPAIGN DONE ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
