"""Extend the rtlightmap_dir held-out set from 3 to 11 poses (VERDICT r4
weak #5: every other slot evaluates on 11 poses; the directional lightmap
slot's 3 made it the thinnest validation in the weight set).

Appends NEW valid poses to data/master_r2_dir/valid continuing the
existing c-index series (cornell c2..c6, glass c1..c3 — fresh pose seeds,
disjoint from the train rings), same conventions as gen_dataset_r2.gen_dir
(256^2, 8 spp noisy / 1024 spp clean, SH-L1 snorm pairs). Resumable.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/gen_dir_valid_r5.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np

import jax

from gen_dataset_r2 import (  # noqa: E402
    DIR_CLEAN_SPP,
    DIR_NOISY_SPP,
    DIR_RES,
    OUT,
    REF,
    _ring_poses,
    _step_bounded,
)
from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene

# (scene, file, first new c-index, new valid poses)
EXTRA = [
    ("cornell", f"{REF}/cornell.txt", 2, _ring_poses(5, 151)),
    ("glass", f"{REF}/cornellGlass.txt", 1, _ring_poses(3, 161)),
]


def main():
    out_dir = os.path.join(OUT + "_dir", "valid")
    os.makedirs(out_dir, exist_ok=True)
    for sname, path, c0, poses in EXTRA:
        scene = load_scene(path)
        scene.set_resolution(DIR_RES, DIR_RES)
        opts = RenderOptions(dir_aov=True, megakernel=False)
        noisy_r = Renderer(scene, opts, seed=2)
        clean_r = Renderer(scene, opts, seed=9002)
        t0 = time.time()
        for k, eye in enumerate(poses):
            ci = c0 + k
            if os.path.exists(os.path.join(out_dir, f"{sname}_c{ci}.input.npy")):
                continue  # resumable
            for r in (noisy_r, clean_r):
                r.move_camera(position=eye)
            noisy_r.base_key = jax.random.key(5300 + ci)
            clean_r.base_key = jax.random.key(58000 + ci)
            noisy_r.step_many(DIR_NOISY_SPP)
            _step_bounded(clean_r, DIR_CLEAN_SPP)
            np.save(os.path.join(out_dir, f"{sname}_c{ci}.input.npy"),
                    noisy_r.dir_image().astype(np.float32))
            np.save(os.path.join(out_dir, f"{sname}_c{ci}.target.npy"),
                    clean_r.dir_image().astype(np.float32))
            print(f"dir valid {sname}_c{ci} ({time.time()-t0:.0f}s)", flush=True)
    print("ALLDONE", flush=True)


if __name__ == "__main__":
    main()
