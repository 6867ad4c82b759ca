"""Compile-probe the full megakernel with the BVH tier at 64x64.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_mega_bvh.py
"""

import time

import numpy as np

import jax

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene

if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    scene = load_scene("scenes/cornellShip.txt")
    scene.set_resolution(64, 64)
    r = Renderer(scene, RenderOptions(megakernel=True), seed=0)
    t0 = time.perf_counter()
    r.step_many(4)
    img = r.beauty()
    print(f"compile+run {time.perf_counter()-t0:.1f}s; mean {img.mean():.4f} "
          f"max {img.max():.3f} finite {bool(np.isfinite(img).all())}", flush=True)
    print("ALLDONE", flush=True)
