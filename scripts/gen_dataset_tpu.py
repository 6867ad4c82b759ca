"""Generate a larger denoiser training set on TPU with the megakernel.

Inputs are 9 channels (noisy color, albedo, first-hit normal); trainers for
3/6-channel slots slice the prefix.

Camera moves don't recompile (CameraParams is dynamic), so one compile per
scene serves all poses; clean targets at 2048 spp are ~2s each.
"""

import os
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene.builtin import cornell_box, cornell_glass, emissive_sphere

OUT = sys.argv[1] if len(sys.argv) > 1 else "data/denoise_v2"
RES = 256
NOISY_SPP = 16
CLEAN_SPP = 2048

CAMERAS = [
    None,
    (2.0, 6.0, 9.0),
    (-2.5, 4.0, 9.5),
    (0.5, 7.5, 8.0),
    (-1.0, 3.0, 10.5),
    (3.0, 5.0, 10.0),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    scenes = {
        "cornell": cornell_box,
        "glass": cornell_glass,
        "sphere": emissive_sphere,
    }
    t_start = time.time()
    for sname, maker in scenes.items():
        scene = maker(resolution=(RES, RES), iterations=CLEAN_SPP, depth=8)
        noisy_r = Renderer(scene, RenderOptions(megakernel=True), seed=1)
        clean_r = Renderer(scene, RenderOptions(megakernel=True), seed=9001)
        for ci, eye in enumerate(CAMERAS):
            for r in (noisy_r, clean_r):
                if eye is not None:
                    r.move_camera(position=eye)
                else:
                    r.reset()
            noisy_r.base_key = __import__("jax").random.key(100 + ci)
            clean_r.base_key = __import__("jax").random.key(7000 + ci)
            noisy_r.step_many(NOISY_SPP)
            clean_r.step_many(CLEAN_SPP)
            noisy = noisy_r.beauty()
            albedo = noisy_r.albedo_image()
            normal = noisy_r.normal_image()
            clean = clean_r.beauty()
            x = np.concatenate([noisy, albedo, normal], axis=-1).astype(np.float32)
            np.save(os.path.join(OUT, f"{sname}_c{ci}.input.npy"), x)
            np.save(os.path.join(OUT, f"{sname}_c{ci}.target.npy"), clean.astype(np.float32))
            print(f"{sname}_c{ci}: noisy {noisy.mean():.3f} clean {clean.mean():.3f}", flush=True)
    print(f"done in {time.time() - t_start:.0f}s", flush=True)


if __name__ == "__main__":
    main()
