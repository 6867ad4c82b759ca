"""winner_table="f16" validation on the cottage asset (TPU).

The ship probe (scripts/probe_winner_f16.py) covered the packed-atlas
path; the cottage has mixed-resolution kd/bump maps, so it exercises the
per-map atlas FALLBACK with the f16 winner table. Reports per-config
throughput and the f32-vs-f16 image RMSE after equal iterations.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_winner_f16_cottage.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene


def render(wt, res=400, iters=16):
    sc = load_scene("scenes/cornellCottage.txt")
    sc.set_resolution(res, res)
    r = Renderer(sc, RenderOptions(megakernel=False, winner_table=wt), seed=0)
    r.step_many(2)
    np.asarray(r.image.x[:4])
    t0 = time.time()
    r.step_many(iters)
    np.asarray(r.image.x[:4])
    dt = (time.time() - t0) / iters
    img = np.stack([np.asarray(c) for c in
                    (r.image.x, r.image.y, r.image.z)], -1) / r.iteration
    print(f"cottage {res} {wt}: {dt*1000:.1f} ms/iter, "
          f"{res*res/dt/1e6:.3f} Msam/s, mean {img.mean():.5f}", flush=True)
    return img


if __name__ == "__main__":
    a = render("f32")
    b = render("f16")
    d = a - b
    print(f"f32-vs-f16 image RMSE {float(np.sqrt((d*d).mean())):.6f}, "
          f"max|diff| {float(np.abs(d).max()):.6f}", flush=True)
    print("PROBE DONE", flush=True)
