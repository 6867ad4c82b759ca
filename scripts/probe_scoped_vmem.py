"""Can --xla_tpu_scoped_vmem_limit_kib unlock the textured-tier recheck?

The textured rows kernel (25 face quantities, 18.7 MiB VMEM operand) plus
an in-kernel lax.cond overflows the 16 MiB scoped-vmem stack of the XLA
bounce cond (docs/MESH_TIERS.md). The axon tunnel forwards proto-backed
xla_* flags per-compile, so a client-side XLA_FLAGS bump may raise the
limit. This probes the textured ship with the recheck FORCED on (env
MYGPURT_FORCE_RECHECK=1 flips the footprint gate in ops/trace.py).

Run: XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=49152" \
     MYGPURT_FORCE_RECHECK=1 \
     PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_scoped_vmem.py
"""

import os
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
          f"mean {float(np.asarray(r.image.x).mean()):.4f})", flush=True)


if __name__ == "__main__":
    print("XLA_FLAGS =", os.environ.get("XLA_FLAGS"), flush=True)
    bench("T256 rows+forced-recheck", "scenes/shipTexOnly.txt", 256,
          mesh_tier="rows")
    bench("T800 rows+forced-recheck", "scenes/shipTexOnly.txt", 800,
          batch=2, mesh_tier="rows")
