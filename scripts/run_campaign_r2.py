"""Round-2 denoiser campaign driver: prep -> train all slots -> eval.

One long TPU job; safe to kill and relaunch (train_device resumes from the
latest checkpoint per slot, prep/eval are idempotent). Slot order puts the
runtime-flagship weights first so partial progress still ships usable TZAs.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/run_campaign_r2.py [epochs] [slots-csv]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import campaign_r2 as c

# rt_ldr_alb feeds the fused render->denoise path (bench.py + the raytrace
# app's CPUdenoise analog); the alb_nrm tiers are the quality headline.
# Per-slot epoch budget: ~225 img/s measured => ~2.3 s/epoch; the full
# reference regime (2000) goes to the flagship slot, the rest get what a
# single-chip session affords (wall-clock, not quality, is the binding
# constraint — checkpoints resume, so later rounds can extend any slot).
PRIORITY = {
    "rt_ldr_alb": 2000, "rt_hdr_alb": 1000,
    "rt_ldr_alb_nrm": 1000, "rt_hdr_alb_nrm": 800,
    "rt_alb": 400, "rt_nrm": 200,
    "rt_ldr": 300, "rt_hdr": 300,
    "rt_ldr_calb_cnrm": 300, "rt_hdr_calb_cnrm": 300,
    "rtlightmap_hdr": 300, "rtlightmap_dir": 300,
}

if __name__ == "__main__":
    override = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    slots = sys.argv[2].split(",") if len(sys.argv) > 2 and sys.argv[2] else list(PRIORITY)
    t0 = time.time()
    c.stage_prep()
    print(f"prep done ({time.time()-t0:.0f}s)", flush=True)
    for slot in slots:
        t1 = time.time()
        c.stage_train([slot], override or PRIORITY[slot])
        print(f"### {slot} trained+exported ({time.time()-t1:.0f}s)", flush=True)
        # eval the slot just trained: partial results ship too (r2_eval.json
        # merges across calls)
        try:
            c.stage_eval([slot])
        except Exception as e:  # eval must never kill the training queue
            print(f"eval failed: {e}", flush=True)
    print(f"CAMPAIGN DONE ({time.time()-t0:.0f}s)", flush=True)
