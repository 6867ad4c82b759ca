"""Framework benchmark — prints ONE JSON line for the driver.

Metric: Msamples/sec path-tracing the canonical Cornell workload
(800x800, depth 8 — scenes/cornell.txt camera block) on the available
device. vs_baseline is measured / 50 Msamples/s (the BASELINE.md north-star
for one v5e chip).

Timing excludes compilation (first step_many call) and uses an explicit
device->host sync; samples are dispatched as one device program per batch.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from mygpuraytracer_tpu.config import RenderOptions
    from mygpuraytracer_tpu.render import Renderer
    from mygpuraytracer_tpu.scene import load_scene
    from mygpuraytracer_tpu.scene.builtin import cornell_box

    scene_path = "/root/reference/scenes/cornell.txt"
    if os.path.exists(scene_path):
        scene = load_scene(scene_path)
    else:
        scene = cornell_box()

    import jax

    on_tpu = jax.default_backend() != "cpu"
    # The Pallas megakernel (one kernel per MC iteration) is TPU-only;
    # mesh/textured scenes fall back to the wavefront path automatically.
    r = Renderer(scene, RenderOptions(megakernel=on_tpu), seed=0)

    def sync():
        np.asarray(r.image.x[:8])

    # Warmup / compile (one program serves any sample count).
    r.step_many(4)
    sync()

    # Measure in large batches (one device program each) until >= 2s of
    # samples; large batches amortize the per-dispatch sync latency.
    width, height = r.meta.resolution
    total_iters = 0
    total_time = 0.0
    batch = 128
    while total_time < 2.0 and total_iters < 1024:
        t0 = time.perf_counter()
        r.step_many(batch)
        sync()
        total_time += time.perf_counter() - t0
        total_iters += batch

    msamples = width * height * total_iters / total_time / 1e6

    img = r.beauty()
    finite = bool(np.isfinite(img).all())
    nonzero = bool(img.mean() > 0.01)

    result = {
        "metric": "cornell_800x800_depth8_path_trace",
        "value": round(msamples, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msamples / 50.0, 3),
        "iters_per_sec": round(total_iters / total_time, 2),
        "sanity": {"finite": finite, "nonzero": nonzero},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
