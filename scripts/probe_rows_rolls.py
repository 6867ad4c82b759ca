"""Decompose the rows-tier visit cost: are the 13 per-step lane-rolls
a dominant term?

The rows kernel rolls all Q=13 face-quantity (8,128) blocks one lane per
step (ops/trace.py mesh_rows_hit). Per bounce at shipOnly 800^2 that is
~17.5k visits x 16 steps x 53 KB of roll traffic ~ 15 GB. This probe times
the REAL kernel against the MYGPURT_ROWS_TIMING_ROLL4 escape (rolls only 4
blocks — image is wrong, loop structure identical). A large gap means the
roll traffic dominates and a ray-rolling restructure (~5 rolled arrays
instead of 13) is worth building; a small gap kills that idea cheaply.

Run twice (env read at trace time):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_rows_rolls.py
  MYGPURT_ROWS_TIMING_ROLL4=1 PYTHONPATH=... python scripts/probe_rows_rolls.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 800


def main():
    tag = "roll4" if os.environ.get("MYGPURT_ROWS_TIMING_ROLL4") else "full"
    sc = load_scene("scenes/shipOnly.txt")
    sc.set_resolution(RES, RES)
    r = Renderer(sc, RenderOptions(megakernel=False), seed=0)
    t0 = time.perf_counter()
    r.step_many(2)
    np.asarray(r.image.x[:4])
    print(f"{tag}: compile+2it {time.perf_counter()-t0:.0f}s", flush=True)
    iters, total = 0, 0.0
    while total < 6.0 and iters < 32:
        t0 = time.perf_counter()
        r.step_many(4)
        np.asarray(r.image.x[:4])
        total += time.perf_counter() - t0
        iters += 4
    ms = total / iters * 1e3
    print(f"{tag}: {ms:.1f} ms/iter  {RES*RES*iters/total/1e6:.3f} Msam/s  "
          f"mean {float(r.beauty().mean()):.6f}", flush=True)
    print("ROLL PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
