"""Measure the dead-lane masking win on the mesh wavefront tiers (TPU).

scripts/probe_liveness.py (CPU): only ~3.1% of shipOnly/shipTexOnly lanes
survive bounce 0 (open scene — most camera rays miss the floating ship),
yet terminated lanes keep their stale ray and kept slab-hitting clusters,
so bounces 1-7 streamed near-full visit lists for a ~97%-dead wavefront.
intersect_soa(active=remaining>0) now masks dead lanes to the padding-ray
convention (zero visits). Expected: bounces 1-7 stream only the live ~3%,
so the mesh term drops toward ~bounce-0-only; control = the banked
unmasked numbers (docs/MESH_TIERS.md: shipOnly 800^2 260.5 ms / 2.456
Msam/s f32 winners; shipTexOnly 800^2 289.3 ms / 2.213 Msam/s oct winners).

Image-mean parity bars (same session lineage): shipOnly 0.19788,
shipTexOnly 0.19931 (oct drift 6e-6).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_dead_mask.py
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
    print(f"{tag}: compiling...", flush=True)
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
    bench("shipOnly 800 masked", "scenes/shipOnly.txt", 800)
    bench("shipTex 800 masked", "scenes/shipTexOnly.txt", 800)
    # With dead lanes masked the "need" key is ~3% True from bounce 1 on,
    # so the partition that measured a LOSS on mesh-only scenes (all stale
    # lanes "reached") may now pay: alive lanes compact into a few dense
    # rows instead of 4-per-row sparsity across 5000 rows.
    bench("shipOnly 800 masked+need", "scenes/shipOnly.txt", 800,
          mesh_sort="need")
    print("PROBE DONE", flush=True)
