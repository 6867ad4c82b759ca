"""Measure winner_table="f16" (24-byte winner gather rows) on the textured
ship (TPU).

Baseline (2026-08-18, docs/MESH_TIERS.md "byte-packed gathers"): shipTexOnly
800^2 = 398.9 ms/iter (1.605 Msam/s) with the [Fp,12] f32 winner table
(48-byte rows). Gather cost scales with row bytes over an ~8.6 ms floor at
640k indices, so halving the row should shave ~8-10 ms per bounce off the
per-bounce winner gather (~64-80 ms/iter at depth 8). Parity: t/hit are
bitwise identical (the intersection stream is untouched); uv quantizes to
~5e-4 relative (tests/test_textured_tier.py::test_winner_table_f16_matches_f32).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_winner_f16.py
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
    bench("shipTex 800 f32", "scenes/shipTexOnly.txt", 800)
    bench("shipTex 800 f16", "scenes/shipTexOnly.txt", 800,
          winner_table="f16")
    bench("shipTex 256 f16", "scenes/shipTexOnly.txt", 256,
          batch=8, iters=32, winner_table="f16")
    print("PROBE DONE", flush=True)
