"""Chipless compile check for the byte-packed gather paths (TPU AOT).

The uint32 atlas words + the narrowed [Fp,12] winner table change the XLA
graph of every textured render; this settles "does it still build on the
tunnel toolchain?" before the running dataset queue reaches the mesh stage
— .lower().compile() is chipless, so it does not contend with the queue.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_compile_bytegather.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render.renderer import Renderer, _multi_step
from mygpuraytracer_tpu.scene import load_scene


def try_compile(path, res, **opts):
    scene = load_scene(path)
    scene.set_resolution(res, res)
    r = Renderer(scene, RenderOptions(megakernel=False, **opts), seed=0)
    t0 = time.time()
    try:
        lowered = _multi_step.lower(
            r.dev, r.meta, r.options, r.image, r.albedo, r.normal,
            r.dir_acc, r.cache, jnp.int32(1), jnp.int32(4), r.base_key,
        )
        lowered.compile()
        print(f"{path} {res}^2 {opts}: OK ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{path} {res}^2 {opts}: FAIL {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    try_compile("scenes/shipTexOnly.txt", 800)
    try_compile("scenes/cornellShipTex.txt", 384)
    try_compile("scenes/cornellCottage.txt", 384)
    print("COMPILE PROBE DONE", flush=True)
