"""Compile-only matrix for the textured rows tier (no chip time used).

The axon tunnel's remote compile is chipless AOT, so .lower().compile()
settles "does this config build?" without contending with a running render.
Matrix: shipTexOnly at 256/384/800^2 x {rows, rows_dma}. Context: the
recheck commit (75926dd) added the cb SMEM operand to the rows kernel
unconditionally; after it, rows@256^2 textured OOMs the 16 MiB scoped-vmem
stack (18.00M operand staging) while the 384^2 dataset generation appears
to compile — this pins down exactly which shapes build on the current
toolchain before flipping the DMA default.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_compile_matrix.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render.renderer import Renderer, _multi_step
from mygpuraytracer_tpu.scene import load_scene


def try_compile(res, tier):
    scene = load_scene("scenes/shipTexOnly.txt")
    scene.set_resolution(res, res)
    r = Renderer(scene, RenderOptions(megakernel=False, mesh_tier=tier), seed=0)
    t0 = time.time()
    try:
        lowered = _multi_step.lower(
            r.dev, r.meta, r.options, r.image, r.albedo, r.normal,
            r.dir_acc, r.cache, jnp.int32(1), jnp.int32(4), r.base_key,
        )
        lowered.compile()
        print(f"{res}^2 {tier}: OK ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{res}^2 {tier}: FAIL ({time.time()-t0:.0f}s) {msg}", flush=True)


def main():
    for tier in ("rows", "rows_dma"):
        for res in (256, 384, 800):
            try_compile(res, tier)
    print("MATRIX_DONE", flush=True)


if __name__ == "__main__":
    main()
