"""Delete slot slices derived from the cornell*/glass* masters so
campaign prep re-slices them from the upgraded (16384-spp-clean) pool.

stage_prep skips any stem whose .target.npy exists — after
scripts/upgrade_cleans_r3.py rewrites the masters in place, the slices
are stale until deleted. sphere/shipTex/cottage slices are untouched
(their masters were not upgraded).
"""

import glob
import os
import re
import sys

sys.path.insert(0, "/root/repo")

n = 0
for pat in ("data/slots_r3/*/*.npy", "data/slots_r3/*/valid/*.npy"):
    for p in glob.glob(pat):
        stem = re.sub(r"\.(input|target)\.npy$", "", os.path.basename(p))
        sub = "valid/" if "/valid/" in p else ""
        master = f"data/master_r2/{sub}{stem}.master.npz"
        # stale = the master was rewritten (clean upgrade) after slicing
        if os.path.exists(master) and os.path.getmtime(master) > os.path.getmtime(p):
            os.remove(p)
            n += 1
print(f"removed {n} stale slices", flush=True)
