"""Measure the byte-packed gather paths on the textured ship (TPU).

Before (2026-08-18, docs/MESH_TIERS.md): shipTexOnly 800^2 = 462.0 ms/iter
(1.385 Msam/s) with two per-bounce 64-byte-row f32 gathers (winner uv/TBN
from face_ex_t [Fp,16], texels from tex_atlas16 [P,16]). After: the winner
table drops its pad columns ([Fp,12], 48-byte rows) and the texel atlas
gathers 16-byte uint32 rows (u8/255 reconstruction — bit-exact, textures
are uint8 by contract). Gather cost scales with row bytes over an ~8.6 ms
floor at 640k indices, so expected ~0.75x + ~0.25x on the two gathers.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_byte_gathers.py
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
    bench("shipTex 800 bytes", "scenes/shipTexOnly.txt", 800)
    bench("shipTex 256 bytes", "scenes/shipTexOnly.txt", 256, batch=8, iters=32)
    bench("ship 800 (control)", "scenes/shipOnly.txt", 800)
    print("PROBE DONE", flush=True)
