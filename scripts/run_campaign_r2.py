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
PRIORITY = [
    "rt_ldr_alb", "rt_hdr_alb", "rt_ldr_alb_nrm", "rt_hdr_alb_nrm",
    "rt_alb", "rt_nrm", "rt_ldr", "rt_hdr",
    "rt_ldr_calb_cnrm", "rt_hdr_calb_cnrm",
    "rtlightmap_hdr", "rtlightmap_dir",
]

if __name__ == "__main__":
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    slots = sys.argv[2].split(",") if len(sys.argv) > 2 and sys.argv[2] else PRIORITY
    t0 = time.time()
    c.stage_prep()
    print(f"prep done ({time.time()-t0:.0f}s)", flush=True)
    for slot in slots:
        t1 = time.time()
        c.stage_train([slot], epochs)
        print(f"### {slot} trained+exported ({time.time()-t1:.0f}s)", flush=True)
        # eval the slot just trained: partial results ship too (r2_eval.json
        # merges across calls)
        try:
            c.stage_eval([slot])
        except Exception as e:  # eval must never kill the training queue
            print(f"eval failed: {e}", flush=True)
    print(f"CAMPAIGN DONE ({time.time()-t0:.0f}s)", flush=True)
