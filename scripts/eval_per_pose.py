"""Per-pose display-domain RMSE for a denoiser slot on the r3 valid masters.

CPU-friendly (inference only); predicts bench.py's
rmse_ldr_denoised_16spp_vs_own_1024spp from the cornell800 rows.

Usage: JAX_PLATFORMS=cpu python scripts/eval_per_pose.py [slot]
"""

import glob
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import campaign_r2 as c

from mygpuraytracer_tpu.denoise.weights import load_default_params
from mygpuraytracer_tpu.train.infer import Infer, psnr, rmse

slot = sys.argv[1] if len(sys.argv) > 1 else "rt_ldr_alb"
params, rnd = load_default_params(slot)
assert not rnd, "random weights"
f = c.slot_cfg_fields(slot)
infer = Infer(params, transfer=f["transfer"], hdr=f["hdr"])
masters = sorted(glob.glob(os.path.join("data/master_r2/valid", "*.master.npz")))
rows = []
for path in masters:
    m = np.load(path)
    x, y = c.recipe(m, slot)
    out = infer(x)
    gt = np.clip(y, 0, 1)
    pred = np.clip(out, 0, 1)
    noisy = np.clip(x[..., :3], 0, 1)
    r = rmse(pred, gt)
    rows.append((os.path.basename(path), r, psnr(pred, gt), rmse(noisy, gt)))
    print(f"{rows[-1][0]:32s} rmse {r:.5f} psnr {rows[-1][2]:.2f} "
          f"(noisy rmse {rows[-1][3]:.5f})", flush=True)
print(f"mean rmse {np.mean([r[1] for r in rows]):.5f}")
