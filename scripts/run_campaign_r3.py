"""Round-3 denoiser campaign driver: prep -> fine-tune all slots -> eval.

Like run_campaign_r2 but with campaign_r3's locations (enlarged textured/
mesh dataset, warm start from the committed round-2 TZA weights, gentler
OneCycle). One long TPU job; safe to kill and relaunch — train_device
resumes from the latest checkpoint per slot, prep/eval are idempotent,
and each slot exports its TZA + merges its eval row as soon as it
finishes, so partial progress still ships.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/run_campaign_r3.py [epochs] [slots-csv]
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import campaign_r3  # noqa: F401  (configures campaign_r2 module globals)
import campaign_r2 as c

# Bench slot first, then the aux prefilters (feed calb/cnrm + the
# --prefilter_aux chain), then HDR/LDR mains, wide tiers, lightmap last
# (its dataset is unchanged from round 2 but its round-2 checkpoints are
# gone, so it fine-tunes from the committed TZA like the rest).
PRIORITY = {
    "rt_ldr_alb": 1200, "rt_alb": 500, "rt_nrm": 400,
    "rt_hdr_alb": 800, "rt_ldr": 600, "rt_hdr": 600,
    "rt_ldr_alb_nrm": 600, "rt_hdr_alb_nrm": 600,
    "rt_ldr_calb_cnrm": 400, "rt_hdr_calb_cnrm": 400,
    "rtlightmap_hdr": 300, "rtlightmap_dir": 300,
}

if __name__ == "__main__":
    override = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    slots = (sys.argv[2].split(",") if len(sys.argv) > 2 and sys.argv[2]
             else list(PRIORITY))
    t0 = time.time()
    c.stage_prep()
    print(f"prep done ({time.time()-t0:.0f}s)", flush=True)
    import os

    for slot in slots:
        done_flag = os.path.join(c.RESULTS_DIR, slot, "DONE")
        if os.path.exists(done_flag):
            print(f"### {slot} already done; skipping", flush=True)
            continue
        t1 = time.time()
        c.stage_train([slot], override or PRIORITY[slot])
        print(f"### {slot} trained+exported ({time.time()-t1:.0f}s)", flush=True)
        try:
            c.stage_eval([slot])
        except Exception as e:  # eval must never kill the training queue
            print(f"eval failed: {e}", flush=True)
        # Sentinel AFTER export+eval: crash-retry re-runs an unfinished slot
        # (train_device resumes from its checkpoints / best.pkl), but a
        # finished slot is never reloaded or re-exported.
        with open(done_flag, "w") as f:
            f.write("exported+evaled\n")
    print(f"CAMPAIGN DONE ({time.time()-t0:.0f}s)", flush=True)
