"""Hardware shoot-out of the three mesh tiers (docs/MESH_TIERS.md):

  lists — (8,128)-block visit-list kernel (round-3 default)
  rows  — row-granular shifted-face kernel (16-step visits per 128-ray row)
  conds — round-2 in-kernel slab+cond walk

on shipOnly (23k faces, untextured) at 256^2 and 800^2, plus the textured
ship (shipTexOnly) on the tiers that carry uv/TBN. The 'rows' prototype
measured 8x fewer roll-steps per visit and ~3x smaller per-row unions
(scripts/sim_union_blocks.py) — this decides the production default.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_tiers_r3.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene


def bench(tag, path, res, batch=4, secs=6.0, **opts):
    scene = load_scene(path)
    scene.set_resolution(res, res)
    r = Renderer(scene, RenderOptions(megakernel=False, **opts), seed=0)
    r.step_many(batch)
    np.asarray(r.image.x[:8])
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < secs:
        r.step_many(batch)
        np.asarray(r.image.x[:8])
        n += batch
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt*1e3:7.1f} ms/iter ({res*res/dt/1e6:7.3f} Msam/s, "
          f"mean {float(np.asarray(r.image.x).mean()):.3f})", flush=True)


def main():
    for tier in ("lists", "rows", "conds"):
        bench(f"S256 {tier:5s}", "scenes/shipOnly.txt", 256, mesh_tier=tier)
    for tier in ("lists", "rows"):
        bench(f"S800 {tier:5s}", "scenes/shipOnly.txt", 800, batch=2,
              mesh_tier=tier)
    for tier in ("lists", "rows"):
        bench(f"T256 {tier:5s}", "scenes/shipTexOnly.txt", 256, mesh_tier=tier)


if __name__ == "__main__":
    main()
