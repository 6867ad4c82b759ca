"""Extra noisy realizations for the r2 master dataset.

Each existing train master gets K additional 16-spp renders from fresh RNG
streams, saved as <stem>rK.master.npz with the ORIGINAL clean targets —
the trainer samples poses uniformly, so each target is now seen under
several independent noise patterns (the denoiser must learn the posterior
mean, not one realization). Valid masters are left untouched.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/gen_noisy_extra.py [K]
"""

import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene

sys.path.insert(0, "/root/repo/scripts")
from gen_dataset_r2 import NOISY_SPP, RES, SCENES  # noqa: E402

K = int(sys.argv[1]) if len(sys.argv) > 1 else 3
OUT = "data/master_r2"


def main():
    on_tpu = jax.default_backend() != "cpu"
    for sname, path, train_poses, _valid, mega in SCENES:
        scene = load_scene(path)
        scene.set_resolution(RES, RES)
        opts = RenderOptions(megakernel=on_tpu and mega)
        r = Renderer(scene, opts, seed=11)
        t0 = time.time()
        for ci, eye in enumerate(train_poses):
            base = os.path.join(OUT, f"{sname}_c{ci}.master.npz")
            if not os.path.exists(base):
                continue
            m = np.load(base)
            for k in range(2, 2 + K):
                out = os.path.join(OUT, f"{sname}_c{ci}r{k}.master.npz")
                if os.path.exists(out):
                    continue
                if eye is not None:
                    r.move_camera(position=eye)
                else:
                    r.reset()
                r.base_key = jax.random.key(50_000 + 1000 * k + ci)
                r.step_many(NOISY_SPP)
                np.savez(
                    out,
                    noisy_color=r.beauty().astype(np.float32),
                    noisy_albedo=r.albedo_image().astype(np.float32),
                    noisy_normal=r.normal_image().astype(np.float32),
                    clean_color=m["clean_color"],
                    clean_albedo=m["clean_albedo"],
                    clean_normal=m["clean_normal"],
                )
            print(f"{sname}_c{ci} +{K} ({time.time()-t0:.0f}s)", flush=True)
    print("ALLDONE", flush=True)


if __name__ == "__main__":
    main()
