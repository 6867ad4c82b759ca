"""TPU verification + timing of the megakernel cluster-BVH mesh tier.

1. correctness: 64x64 @ 32spp megakernel render of cornellShip vs the CPU
   wavefront oracle path (threefry) — per-pixel agreement is statistical
   (different RNG), so compare means/quantiles.
2. perf: 800x800 Msamples/s on shipOnly (the >=20k-face bar) + cornellShip.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/verify_bvh.py
"""

import time

import numpy as np

import jax


def render_mega(scene_path, res, iters, batch=None):
    from mygpuraytracer_tpu.config import RenderOptions
    from mygpuraytracer_tpu.render import Renderer
    from mygpuraytracer_tpu.scene import load_scene

    scene = load_scene(scene_path)
    scene.set_resolution(res, res)
    r = Renderer(scene, RenderOptions(megakernel=True), seed=0)
    r.step_many(1)
    np.asarray(r.image.x[:4])  # compile sync
    r.reset()
    t0 = time.perf_counter()
    r.step_many(iters)
    np.asarray(r.image.x[:4])
    dt = time.perf_counter() - t0
    return r, dt


def main():
    print("devices:", jax.devices(), flush=True)

    # ---- correctness at 64x64 ----------------------------------------------
    t0 = time.perf_counter()
    r, _ = render_mega("scenes/cornellShip.txt", 64, 32)
    print(f"compile+render 64x64: {time.perf_counter()-t0:.1f}s", flush=True)
    img = r.beauty()
    print("mega cornellShip 64x64x32spp: mean", img.mean().round(4),
          "max", img.max().round(3), "finite", bool(np.isfinite(img).all()),
          flush=True)
    np.save("/tmp/bvh_mega64.npy", img)

    # ---- perf at 800x800 ----------------------------------------------------
    for scene in ("scenes/shipOnly.txt", "scenes/cornellShip.txt"):
        t0 = time.perf_counter()
        r, dt = render_mega(scene, 800, 16)
        ms = 800 * 800 * 16 / dt / 1e6
        print(f"{scene}: 16spp in {dt:.3f}s = {ms:.1f} Msamples/s "
              f"(compile {time.perf_counter()-t0-dt:.0f}s)", flush=True)
        img = r.beauty()
        print("  mean", img.mean().round(4), "finite",
              bool(np.isfinite(img).all()), flush=True)

    print("ALLDONE", flush=True)


if __name__ == "__main__":
    main()
