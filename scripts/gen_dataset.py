"""Generate denoiser training pairs with the built-in path tracer.

Renders (noisy 16spp color + albedo, clean N-spp color) pairs over builtin
scenes x camera variants. Run on CPU (no compile penalty) or TPU.

Usage: python scripts/gen_dataset.py [out_dir] [clean_spp]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene.builtin import cornell_box, cornell_glass, emissive_sphere


def render_pair(scene, out_dir, name, noisy_spp, clean_spp, seed, eye=None):
    r = Renderer(scene, RenderOptions(), seed=seed)
    if eye is not None:
        r.move_camera(position=eye)
    r.render(iterations=noisy_spp, batch=16)
    noisy = r.beauty()
    albedo = r.albedo_image()
    r2 = Renderer(r.scene, RenderOptions(), seed=seed + 1000)
    r2.render(iterations=clean_spp, batch=32)
    clean = r2.beauty()
    x = np.concatenate([noisy, albedo], axis=-1).astype(np.float32)
    np.save(os.path.join(out_dir, f"{name}.input.npy"), x)
    np.save(os.path.join(out_dir, f"{name}.target.npy"), clean.astype(np.float32))
    print(f"{name}: noisy mean {noisy.mean():.3f} clean mean {clean.mean():.3f}", flush=True)


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "data/denoise"
    clean_spp = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    res = 256
    os.makedirs(out_dir, exist_ok=True)

    cameras = [
        None,
        (2.0, 6.0, 9.0),
        (-2.5, 4.0, 9.5),
    ]
    scenes = {
        "cornell": cornell_box,
        "glass": cornell_glass,
        "sphere": emissive_sphere,
    }
    t0 = time.time()
    for sname, maker in scenes.items():
        for ci, eye in enumerate(cameras):
            scene = maker(resolution=(res, res), iterations=clean_spp, depth=8)
            render_pair(scene, out_dir, f"{sname}_c{ci}", 16, clean_spp, seed=ci * 7 + 1, eye=eye)
    print(f"done in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
