"""Master dataset: everything needed to train all RT weight slots.

Per (scene, camera) saves one .master.npz with:
    noisy_color, noisy_albedo, noisy_normal (16 spp),
    clean_color, clean_albedo, clean_normal (2048 spp)
`prep_slot_datasets.py` slices these into per-slot input/target pairs.
"""

import os
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np

import jax

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene.builtin import cornell_box, cornell_glass, emissive_sphere

OUT = sys.argv[1] if len(sys.argv) > 1 else "data/master"
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
            noisy_r.base_key = jax.random.key(100 + ci)
            clean_r.base_key = jax.random.key(7000 + ci)
            noisy_r.step_many(NOISY_SPP)
            clean_r.step_many(CLEAN_SPP)
            np.savez(
                os.path.join(OUT, f"{sname}_c{ci}.master.npz"),
                noisy_color=noisy_r.beauty().astype(np.float32),
                noisy_albedo=noisy_r.albedo_image().astype(np.float32),
                noisy_normal=noisy_r.normal_image().astype(np.float32),
                clean_color=clean_r.beauty().astype(np.float32),
                clean_albedo=clean_r.albedo_image().astype(np.float32),
                clean_normal=clean_r.normal_image().astype(np.float32),
            )
            print(f"{sname}_c{ci} saved", flush=True)
    print(f"done in {time.time() - t_start:.0f}s", flush=True)


if __name__ == "__main__":
    main()
