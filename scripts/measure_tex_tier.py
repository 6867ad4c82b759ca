"""Measure the textured cluster-BVH tier on hardware (round 3).

Times shipTexOnly / cornellShipTex (textured+bumped 23k faces) and the
untextured shipOnly baseline at 256^2, wavefront + Pallas mesh tier.
Batches of 4 iterations keep each device program under the worker watchdog.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_tex_tier.py
"""

import time

import numpy as np

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene


def bench(scene_path, res=256, batch=4, rounds=4, **opts):
    scene = load_scene(scene_path)
    scene.set_resolution(res, res)
    r = Renderer(scene, RenderOptions(megakernel=False, **opts), seed=0)
    t0 = time.perf_counter()
    r.step_many(batch)
    np.asarray(r.image.x[:8])
    compile_s = time.perf_counter() - t0
    total_iters, total_time = 0, 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        r.step_many(batch)
        np.asarray(r.image.x[:8])
        total_time += time.perf_counter() - t0
        total_iters += batch
    ms = res * res * total_iters / total_time / 1e6
    mean = float(np.asarray(r.image.x).mean())
    print(f"{scene_path} {opts}: {ms:.3f} Msam/s "
          f"(compile+first {compile_s:.0f}s, mean {mean:.4f})", flush=True)
    return ms


if __name__ == "__main__":
    bench("scenes/shipOnly.txt")
    bench("scenes/shipTexOnly.txt")
    bench("scenes/cornellShipTex.txt")
    bench("scenes/cornellShipTex.txt", mesh_sort="need")
