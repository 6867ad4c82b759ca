"""Measure the three sorted-wavefront implementations on hardware.

BASELINE config #3 (cornell + DoF + first-bounce cache + SORT_BY_MATERIAL)
ran 0.32 Msam/s in round 3 — the argsort+36-gathers pathology. Round 4
replaces the default with one fused variadic lax.sort (RenderOptions.
sort_impl). This times all three impls + sort-off on the bench config.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_sort_impls.py [res]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax

import os

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene
from mygpuraytracer_tpu.scene.builtin import cornell_box

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 800


def cornell_scene():
    path = "/root/reference/scenes/cornell.txt"
    return load_scene(path) if os.path.exists(path) else cornell_box()


def main():
    print("devices:", jax.devices(), flush=True)
    configs = [("off", dict(sort_by_material=False))] + [
        (impl, dict(sort_by_material=True, sort_impl=impl))
        for impl in ("fused", "perm", "argsort")
    ]
    # Optional argv[2]: comma-separated impl subset (e.g. "off,fused") so a
    # quick run can time just the bench default without 4 tunnel compiles.
    if len(sys.argv) > 2:
        keep = set(sys.argv[2].split(","))
        configs = [c for c in configs if c[0] in keep]
    base = dict(depth_of_field=True, antialiasing=False,
                cache_first_bounce=True, megakernel=False)
    means = {}
    for name, opts in configs:
        scene = cornell_scene()
        scene.set_resolution(RES, RES)
        r = Renderer(scene, RenderOptions(**base, **opts), seed=0)
        t0 = time.perf_counter()
        r.step_many(2)
        np.asarray(r.image.x[:4])
        print(f"{name}: compile+2it {time.perf_counter()-t0:.0f}s", flush=True)
        iters, total = 0, 0.0
        while total < 4.0 and iters < 64:
            t0 = time.perf_counter()
            r.step_many(4)
            np.asarray(r.image.x[:4])
            total += time.perf_counter() - t0
            iters += 4
        ms = RES * RES * iters / total / 1e6
        means[name] = float(r.beauty().mean())
        print(f"{name}: {total/iters*1e3:.1f} ms/iter  {ms:.3f} Msam/s  "
              f"mean {means[name]:.6f}", flush=True)
    if "off" in means:
        drift = max(abs(means[k] - means["off"]) for k in means)
        print(f"max mean drift vs off: {drift:.2e}", flush=True)
    print("SORT PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
