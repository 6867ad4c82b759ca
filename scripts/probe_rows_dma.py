"""Hardware-verify the rows-tier HBM/DMA face-buffer path (MYGPURT_ROWS_DMA).

The DMA path keeps the face buffer in HBM (memory_space=ANY) and copies one
cluster panel per visit into a VMEM scratch — removing both the VMEM mesh-size
ceiling and the scoped-vmem blocker that forced the dynamic recheck OFF for
the textured ship (ops/trace.py mesh_rows_hit). Parity holds in interpret
mode; this probe checks, on the real chip:

  1. parity — shipTexOnly 256^2 @ 8 iters, DMA vs VMEM images (same seeds
     => identical modulo recheck-independent float assoc; expect ~0 diff);
  2. speed — ms/iter at 256^2 and 800^2 with DMA+recheck vs the current
     production default (VMEM operand, recheck off for textured).

If parity holds and DMA+recheck >= the default's throughput, flip the
trace.py default to `dma = fs.size * 4 >= 14 * 2**20`.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_rows_dma.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene


def render(path, res, iters, **opts):
    scene = load_scene(path)
    scene.set_resolution(res, res)
    r = Renderer(scene, RenderOptions(megakernel=False, **opts), seed=0)
    r.step_many(iters)
    return np.asarray(r.beauty())


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


def main():
    sc = "scenes/shipTexOnly.txt"
    # DMA path FIRST: the VMEM-resident baseline OOMs the 16 MiB scoped-vmem
    # stack at 256^2 on the current toolchain (probe log 2026-08-17 21:51 —
    # 18.00M operand vs 16.00M limit), so rows_dma is the only candidate
    # production tier for the textured ship; measure it, then attempt the
    # baseline for parity (tolerate its compile failure).
    dmai = render(sc, 256, 8, mesh_tier="rows_dma")
    print(f"rows_dma 256^2 x8: mean {dmai.mean():.5f}", flush=True)
    bench("T256 rows dma+recheck", sc, 256, mesh_tier="rows_dma")
    bench("T800 rows dma+recheck", sc, 800, batch=2, mesh_tier="rows_dma")
    # Parity baseline = the lists tier (rows w/ VMEM-resident textured faces
    # no longer compiles at ANY resolution — scripts/probe_compile_matrix.py
    # 2026-08-17: the cb-operand commit regressed its scoped-vmem staging).
    # Images are bit-identical across tiers by construction (same visits,
    # same per-face math; only the visit partitioning differs).
    try:
        base = render(sc, 256, 8, mesh_tier="lists")
        diff = float(np.abs(base - dmai).max())
        print(f"parity vs lists 256^2 x8: max|diff| = {diff:.3e} "
              f"(means {base.mean():.5f} / {dmai.mean():.5f})", flush=True)
    except Exception as e:
        print(f"lists parity baseline failed: {type(e).__name__}", flush=True)
    print("(reference on record: T256 rows 68.9 ms / 0.952 Msam/s, "
          "T800 rows 384.2 ms / 1.666 Msam/s — probe_tiers_r3 2026-08-17)",
          flush=True)
    print("DMA_PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
