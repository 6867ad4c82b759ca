"""Round-5 HDR retrain after the autoexposure-normalization fix (ec2f94b).

The five hdr-family slots were trained on raw-radiance PU/log encodings;
the runtime serves them behind an autoexposure scale — retrain each on the
fixed preprocess (train.py make_preprocess) with keep-best protection under
the FIXED eval (stage_eval now scores behind the serve-path exposure, so
the old blobs' baselines are honest serve-path numbers).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/run_r5_hdrfix.py
Deadline: /tmp/r5_deadline (unix seconds) — remaining slots skip cleanly.
"""

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import run_campaign_r3c as r3c

r3c.DEADLINE_FILE = "/tmp/r5_deadline"

# Leverage order: the bench key slot first, then the two VERDICT-named
# held-out laggards, then the rest of the family.
PLAN = [
    ("rt_hdr_alb", 700),
    ("rt_hdr", 900),
    ("rt_hdr_calb_cnrm", 700),
    ("rt_hdr_alb_nrm", 600),
    ("rtlightmap_hdr", 400),
]

if __name__ == "__main__":
    r3c.c.RESULTS_DIR = "results/r5_hdrfix"
    os.makedirs(r3c.c.RESULTS_DIR, exist_ok=True)
    r3c.run(PLAN)
