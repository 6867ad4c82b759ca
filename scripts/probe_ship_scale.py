"""Resolution scaling of the ship wavefront render: split fixed
per-iteration costs from per-ray mesh work.

  C256 cornell.txt (no mesh) wavefront at 256^2 — wavefront baseline
  S256/S512/S800 shipOnly at 256/512/800 — if Msam/s rises with res, the
  256^2 bench number was fixed-cost-bound, not mesh-bound.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_ship_scale.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene
from mygpuraytracer_tpu.scene.builtin import cornell_box


def bench(tag, scene, res, batch=4, secs=6.0, **opts):
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
    bench("C256 cornell ", cornell_box(), 256)
    bench("S256 shipOnly", load_scene("scenes/shipOnly.txt"), 256)
    bench("S512 shipOnly", load_scene("scenes/shipOnly.txt"), 512)
    bench("S800 shipOnly", load_scene("scenes/shipOnly.txt"), 800, batch=2)


if __name__ == "__main__":
    main()
