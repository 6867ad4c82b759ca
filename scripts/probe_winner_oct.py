"""Measure winner_table="oct" (16-byte deferred-gather rows) on the ship.

The f16 table (24-byte rows) measured 298.0 ms/iter / 2.148 Msam/s on
shipTexOnly 800^2 (docs/MESH_TIERS.md "winner_table f16"). The oct table
packs the TBN as 8-bit octahedral pairs into one word next to the same f16
uv coefficients — 16-byte rows. The byte cost model (~0.4-0.53 ms/byte per
gather over an ~8.6 ms floor at 640k indices) predicts ~3-4 ms/bounce,
~25-35 ms/iter at 800^2 (~ +10%). Also re-times f16 in the same session
(same-chip control) and prints the image-mean drift oct introduces via the
~1-deg TBN quantization of bump-mapped shading normals.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_winner_oct.py
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
    mean = float(np.asarray(r.image.x).mean()) / r.iteration
    print(f"{tag}: {dt*1000:.1f} ms/iter, {res*res/dt/1e6:.3f} Msam/s, "
          f"mean {mean:.5f}", flush=True)
    return mean


if __name__ == "__main__":
    m16 = bench("shipTex 800 f16", "scenes/shipTexOnly.txt", 800,
                winner_table="f16")
    moc = bench("shipTex 800 oct", "scenes/shipTexOnly.txt", 800,
                winner_table="oct")
    print(f"image-mean drift oct vs f16: {abs(moc - m16):.6f}", flush=True)
    bench("shipTex 256 f16", "scenes/shipTexOnly.txt", 256,
          batch=8, iters=32, winner_table="f16")
    bench("shipTex 256 oct", "scenes/shipTexOnly.txt", 256,
          batch=8, iters=32, winner_table="oct")
    print("PROBE DONE", flush=True)
