"""Upgrade the SH-L1 directional-AOV clean targets to 16384 spp (in place).

Same rationale as scripts/upgrade_cleans_r3.py: the 1024-spp dir targets
carry residual MC noise that floors the rtlightmap_dir eval row and leaks
into training. 256^2 renders are cheap (~0.5 G samples/pose). A JSON
manifest records per-stem clean spp so the script is resumable/idempotent.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/upgrade_dir_cleans_r3.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np

import jax

from gen_dataset_r2 import DIR_RES, DIR_SCENES, _step_bounded
from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene

TARGET_SPP = 16384
OUT = "data/master_r2_dir"
MANIFEST = os.path.join(OUT, "clean_spp.json")


def main():
    on_tpu = jax.default_backend() != "cpu"
    spp = TARGET_SPP if on_tpu else 64
    out_root = os.environ.get("UPGRADE_OUT", OUT)
    assert on_tpu or out_root != OUT, (
        "CPU smoke mode would clobber real targets; set UPGRADE_OUT")
    manifest_path = os.path.join(out_root, "clean_spp.json")
    manifest = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            manifest = json.load(fh)
    for sname, path, train_poses, valid_poses in DIR_SCENES:
        scene = load_scene(path)
        scene.set_resolution(DIR_RES, DIR_RES)
        clean_r = Renderer(scene, RenderOptions(dir_aov=True, megakernel=False),
                           seed=9008)
        t0 = time.time()
        for tag, poses in (("", train_poses), ("valid", valid_poses)):
            out_dir = os.path.join(out_root, tag) if tag else out_root
            for ci, eye in enumerate(poses):
                stem = f"{sname}_c{ci}"
                key = f"{tag}/{stem}" if tag else stem
                tgt = os.path.join(out_dir, f"{stem}.target.npy")
                if not os.path.exists(tgt) or manifest.get(key, 0) >= spp:
                    continue
                if eye is not None:
                    clean_r.move_camera(position=eye)
                else:
                    clean_r.reset()
                clean_r.base_key = jax.random.key(78000 + ci + (999 if tag else 0))
                _step_bounded(clean_r, spp, batch=512)
                new = clean_r.dir_image().astype(np.float32)
                old = np.load(tgt)
                assert old.shape == new.shape, (tgt, old.shape, new.shape)
                np.save(tgt + ".tmp.npy", new)
                os.replace(tgt + ".tmp.npy", tgt)
                manifest[key] = spp
                with open(manifest_path, "w") as fh:
                    json.dump(manifest, fh, indent=1)
                print(f"{key}: upgraded ({time.time()-t0:.0f}s)", flush=True)
    print("DIR UPGRADE DONE", flush=True)


if __name__ == "__main__":
    main()
