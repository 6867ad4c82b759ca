"""Upgrade the MESH-scene VALID clean targets (in place).

The eval rows for shipTex/cottage are floored by their 1024-spp GT
(~0.042 display RMSE); train targets stay at 1024 spp (regenerating 15
train poses is out of TPU budget), but the held-out VALID poses are only
3 renders: cottage c0/c1 at 16384 spp (486-tri asset, cheap) and shipTex
c0 at 2048 spp (the embedded-box scene keeps all 8 bounces alive — each
1024 spp costs ~10 min even on the packed-texel rows tier). Floors drop
to ~0.010 / 0.030.

Pose lists MUST mirror gen_dataset_r3.R3_SCENES' valid entries.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/upgrade_mesh_valid_r3.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np

import jax

import upgrade_cleans_r3 as u
from gen_dataset_r2 import OUT, RES, _ring_poses, _step_bounded
from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene

JOBS = [
    ("shipTex", "scenes/cornellShipTex.txt", _ring_poses(2, 71)[:1], 2048),
    ("cottage", "scenes/cornellCottage.txt", _ring_poses(2, 81), 4096),
]


def _planes(r):
    return dict(
        color=r.beauty().astype(np.float32),
        albedo=r.albedo_image().astype(np.float32),
        normal=r.normal_image().astype(np.float32),
    )


def main():
    on_tpu = jax.default_backend() != "cpu"
    out_dir = os.path.join(os.environ.get("UPGRADE_OUT", OUT), "valid")
    assert on_tpu or "UPGRADE_OUT" in os.environ, (
        "CPU smoke mode would clobber real masters; set UPGRADE_OUT")
    for sname, path, poses, spp in JOBS:
        scene = load_scene(path)
        scene.set_resolution(RES, RES)
        clean_r = Renderer(scene, RenderOptions(megakernel=False), seed=9009)
        t0 = time.time()
        for ci, eye in enumerate(poses):
            stem = f"{sname}_c{ci}"
            dep = os.path.join(out_dir, f"{stem}.master.npz")
            if not os.path.exists(dep):
                print(f"{stem}: no master on disk; skipping", flush=True)
                continue
            with np.load(dep) as m:
                if "clean_spp" in m and int(m["clean_spp"]) >= spp:
                    continue
            if eye is not None:
                clean_r.move_camera(position=eye)
            else:
                clean_r.reset()
            clean_r.base_key = jax.random.key(79000 + ci)
            total = spp if on_tpu else 16
            done = 0
            while done < total:
                # chunked with progress prints: the queue watchdog kills
                # silent jobs after 25 min (16k-spp poses printed nothing
                # for ~45 min and kill-looped, round-4 log)
                _step_bounded(clean_r, min(512, total - done), batch=16)
                done += min(512, total - done)
                print(f"{stem}: {done}/{total} spp "
                      f"({time.time()-t0:.0f}s)", flush=True)
            planes = _planes(clean_r)
            # pose-sanity guard: old-vs-new must look like MC noise
            # (<~0.1 display RMSE), not a pose mismatch (~0.3+)
            with np.load(dep) as m:
                old = np.clip(m["clean_color"], 0, 1)
            drift = float(np.sqrt(np.mean(
                (old - np.clip(planes["color"], 0, 1)) ** 2)))
            if on_tpu and drift > 0.15:
                print(f"valid/{stem}: REFUSING rewrite, old-vs-new rmse "
                      f"{drift:.3f} looks like a pose mismatch", flush=True)
                continue
            u.TARGET_SPP = spp  # clean_spp marker value for this job
            u._rewrite(dep, planes)
            print(f"valid/{stem}: upgraded to {spp} spp "
                  f"(drift {drift:.4f}, {time.time()-t0:.0f}s)", flush=True)
    print("MESH VALID UPGRADE DONE", flush=True)


if __name__ == "__main__":
    main()
