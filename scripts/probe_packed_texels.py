"""Measure the packed-atlas texel path on the textured ship (TPU).

Before (2026-08-18, docs/MESH_TIERS.md): shipTexOnly 800^2 = 730.4 ms/iter
(0.876 Msam/s) with 4 per-bounce atlas gathers + the winner ex gather.
After: kd/ks/ke/bump collapse into ONE 16-channel row gather per bounce
(fetch_texels_packed; intersect+shade call sites CSE — verified 1 gather
in CPU HLO).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_packed_texels.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene


def bench(tag, path, res, batch=4, iters=16, **opt):
    sc = load_scene(path)
    sc.set_resolution(res, res)
    r = Renderer(sc, RenderOptions(megakernel=False, **opt), seed=0)
    r.step_many(2)
    np.asarray(r.image.x[:4])
    t0 = time.time()
    for _ in range(iters // batch):
        r.step_many(batch)
    np.asarray(r.image.x[:4])
    dt = (time.time() - t0) / iters
    print(f"{tag}: {dt*1000:.1f} ms/iter, {res*res/dt/1e6:.3f} Msam/s, "
          f"mean {float(np.asarray(r.image.x).mean())/r.iteration:.5f}",
          flush=True)


if __name__ == "__main__":
    bench("shipTex 800 packed", "scenes/shipTexOnly.txt", 800)
    bench("shipTex 256 packed", "scenes/shipTexOnly.txt", 256, batch=8, iters=32)
    print("PROBE DONE", flush=True)
