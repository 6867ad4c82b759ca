"""Round-5 keep-best campaign: multi-pass over all slots until a deadline.

Same shape as run_campaign_r4 (keep-best + device-resident plane cache +
per-slot DONE flags via run_campaign_r3c), with round-5 paths: the VM is
wiped between rounds so results/r4_p* are gone; every pass gets a fresh
results/r5_pN dir and /tmp/r5_deadline bounds the loop. Keep-best makes
repeat passes monotone (the per-visit restore point holds the best-so-far
blob) and pass N+1 fine-tunes from pass N's winners.

Pass 1 runs weakest-first (r3c.PLAN); passes 2+ run the bench-critical
slots first (run_campaign_r4b.PLAN: rt_ldr_alb / rt_ldr_alb_nrm head the
pass) so a deadline cut can only cost tail slots.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_campaign_r5.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import run_campaign_r3c as r3c
import run_campaign_r4b as r4b

r3c.DEADLINE_FILE = "/tmp/r5_deadline"


def main():
    t0 = time.time()
    for pass_idx in range(1, 9):
        if r3c.past_deadline():
            break
        r3c.c.RESULTS_DIR = f"results/r5_p{pass_idx}"
        os.makedirs(r3c.c.RESULTS_DIR, exist_ok=True)
        print(f"##### pass {pass_idx} -> {r3c.c.RESULTS_DIR}", flush=True)
        r3c.run(r3c.PLAN if pass_idx == 1 else r4b.PLAN)
    print(f"R5 CAMPAIGN DONE ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
