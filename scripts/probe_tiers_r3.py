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
    # On record (probe_ship_scale + this probe, 2026-08-17): lists S256
    # 108.1 ms / 0.606 Msam/s, S800 925.5 / 0.692; rows S256 69.9 / 0.938,
    # S800 360.4 / 1.776. Each config is a 2-10 min remote compile, so only
    # the undecided textured configs remain.
    bench("T256 lists", "scenes/shipTexOnly.txt", 256, mesh_tier="lists")
    bench("T256 rows ", "scenes/shipTexOnly.txt", 256, mesh_tier="rows")
    bench("T800 rows ", "scenes/shipTexOnly.txt", 800, batch=2, mesh_tier="rows")


if __name__ == "__main__":
    main()
