"""AOT compile-check + measure the bounce megakernel (BVH scenes).

Stage 1 (chipless): .lower().compile() of bvh_bounce_accumulate on shipOnly
at several resolutions — settles whether the reduced feature set (SMEM seed
only; raygen/iteration loop in XLA) avoids the Mosaic CHECK that kills the
fully fused iteration megakernel (docs/MESH_TIERS.md bisection).

Stage 2 (chip; pass "run"): mean-parity vs the wavefront path at 128^2 and
iteration timing at 800^2.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_bounce_mega.py [compile|run]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.ops.vec3 import Vec3
from mygpuraytracer_tpu.render.megakernel import bvh_bounce_accumulate
from mygpuraytracer_tpu.scene import load_scene
from mygpuraytracer_tpu.scene.device_scene import build_device_scene

MODE = sys.argv[1] if len(sys.argv) > 1 else "compile"


def build(res):
    s = load_scene("scenes/shipOnly.txt")
    s.set_resolution(res, res)
    dev, meta = build_device_scene(s, 128)
    return s, dev, meta


def lowered(dev, meta, opts, n):
    import os as _os

    fb = (dev.face_plane if _os.environ.get("MYGPURT_BOUNCE_WALK") == "conds"
          else dev.face_shift)
    z = lambda: jnp.zeros((n,), jnp.float32)
    return jax.jit(
        lambda img, alb, nrm, si, ni, k: bvh_bounce_accumulate(
            meta, opts, dev.camera, fb, img, alb, nrm, si, ni, k)
    ).lower(
        Vec3(z(), z(), z()), Vec3(z(), z(), z()), Vec3(z(), z(), z()),
        jnp.int32(1), jnp.int32(4), jax.random.key(0),
    )


def main():
    print("devices:", jax.devices(), flush=True)
    opts = RenderOptions(megakernel=True, bounce_megakernel=True)
    if MODE == "compile":
        for res in (256, 800):
            t0 = time.perf_counter()
            s, dev, meta = build(res)
            try:
                lowered(dev, meta, opts, res * res).compile()
                print(f"COMPILE OK {res}^2  ({time.perf_counter()-t0:.0f}s)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"COMPILE FAIL {res}^2: {type(e).__name__}: {e}",
                      flush=True)
        return

    # chip run: parity vs wavefront means + timing
    from mygpuraytracer_tpu.render import Renderer

    s, dev, meta = build(128)
    r_wave = Renderer(s, RenderOptions(megakernel=False), seed=3)
    r_wave.step_many(16)
    wave = r_wave.beauty()
    r_mega = Renderer(s, RenderOptions(megakernel=True, bounce_megakernel=True), seed=3)
    r_mega.step_many(16)
    mega = r_mega.beauty()
    print(f"means 128^2 x16: wavefront {wave.mean():.5f}  bounce-mega "
          f"{mega.mean():.5f}  |d| {abs(wave.mean()-mega.mean()):.5f}",
          flush=True)

    s, dev, meta = build(800)
    r = Renderer(s, RenderOptions(megakernel=True, bounce_megakernel=True), seed=0)
    r.step_many(2)
    np.asarray(r.image.x[:4])
    t0 = time.perf_counter()
    iters = 16
    r.step_many(iters)
    np.asarray(r.image.x[:4])
    dt = time.perf_counter() - t0
    ms = 800 * 800 * iters / dt / 1e6
    print(f"shipOnly 800^2 bounce-mega: {dt/iters*1e3:.1f} ms/iter  "
          f"{ms:.3f} Msam/s", flush=True)


if __name__ == "__main__":
    main()
