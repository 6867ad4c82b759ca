"""Round-4 keep-best campaign: multi-pass over all slots until a deadline.

Thin wrapper over run_campaign_r3c (same keep-best + device-resident plane
cache + per-slot DONE flags), with:

- a FRESH results dir per pass (the round-3 VM survived into round 4, so
  results/r3c still carries last round's DONE flags and would skip every
  slot);
- multiple passes until /tmp/r4_deadline: keep-best makes repeat passes
  monotone (a worse retrain restores the committed blob), and pass N+1
  fine-tunes from pass N's winners — the r3d second pass improved 10 of
  12 slots this way;
- the mesh-enriched pool (cottage 10+2 poses, shipTex c4+valid) generated
  by run_r4_stage1.sh.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_campaign_r4.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import run_campaign_r3c as r3c

r3c.DEADLINE_FILE = "/tmp/r4_deadline"


def main():
    t0 = time.time()
    for pass_idx in range(1, 9):
        if r3c.past_deadline():
            break
        r3c.c.RESULTS_DIR = f"results/r4_p{pass_idx}"
        os.makedirs(r3c.c.RESULTS_DIR, exist_ok=True)
        print(f"##### pass {pass_idx} -> {r3c.c.RESULTS_DIR}", flush=True)
        r3c.run(r3c.PLAN)
    print(f"R4 CAMPAIGN DONE ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
