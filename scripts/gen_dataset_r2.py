"""Round-2 master dataset: reference scenes x many poses + valid split + the
SH-L1 directional lightmap pairs for rtlightmap_dir.

Per (scene, pose) writes <out>/(valid/)<scene>_c<i>.master.npz with
noisy_{color,albedo,normal} (16 spp) and clean_{color,albedo,normal}
(2048 spp); prep_slot_datasets.py slices these per weight slot. Directional
pairs go to <out>_dir/(valid/) as ready .input/.target.npy (3ch snorm).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/gen_dataset_r2.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax

from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene

OUT = sys.argv[1] if len(sys.argv) > 1 else "data/master_r2"
RES = 384
NOISY_SPP = 16
CLEAN_SPP = 2048
DIR_RES = 256
DIR_NOISY_SPP = 8
DIR_CLEAN_SPP = 1024

REF = "/root/reference/scenes"


def _ring_poses(n, seed, r=(9.0, 11.0), x=(-3.2, 3.2), y=(2.5, 7.5)):
    """Deterministic camera-eye spread inside the cornell viewing volume.
    Extra poses are nearly free on TPU (compute is ~1s/pose; compiles are
    per-scene), and pose diversity is what the round-1 denoiser lacked."""
    rng = np.random.default_rng(seed)
    return [
        (float(rng.uniform(*x)), float(rng.uniform(*y)), float(rng.uniform(*r)))
        for _ in range(n)
    ]


# (name, scene file, train poses, valid poses, megakernel) — poses are EYE
# overrides. The ship scene stays on the wavefront path: the combined
# megakernel+BVH program still crashes the Mosaic compiler (see
# scripts/probe_mega_bisect.py).
SCENES = [
    ("cornell", f"{REF}/cornell.txt",
     [None] + _ring_poses(13, 10), _ring_poses(3, 11), True),
    ("glass", f"{REF}/cornellGlass.txt",
     [None] + _ring_poses(11, 20), _ring_poses(3, 21), True),
    ("sphere", f"{REF}/sphere.txt",
     [None] + _ring_poses(5, 30), _ring_poses(2, 31), True),
    # ship dropped from the denoiser dataset: 2048-spp ground truths over the
    # 23k-face mesh cost ~45 min/pose even on the Pallas cluster tier (~0.1
    # Msam/s on incoherent bounces; >60s programs trip the worker watchdog).
    # The denoiser quality bar is evaluated on the reference scenes.
]

# sphere is a lone emissive object — no scatter surfaces, so its SH-L1
# directional AOV is identically zero; use the two cornell variants instead.
DIR_SCENES = [
    ("cornell", f"{REF}/cornell.txt",
     [None] + _ring_poses(5, 50), _ring_poses(2, 51)),
    ("glass", f"{REF}/cornellGlass.txt",
     [None] + _ring_poses(3, 60), _ring_poses(1, 61)),
]


def _step_bounded(r, spp, batch=128, beat_s=120.0):
    """step_many in bounded programs with host syncs between them.

    A single 2048-iteration wavefront program over the 23k-face ship runs
    long enough that the TPU worker dies mid-program ('kernel fault');
    ~4s programs with a sync in between keep the worker alive.

    Prints a heartbeat every `beat_s` seconds: the stage watchdogs kill on
    ~25 min of log/file silence, and an 18-min-per-pose mesh clean plus a
    cold remote compile can exceed that with no output otherwise."""
    done = 0
    last = time.time()
    while done < spp:
        n = min(batch, spp - done)
        r.step_many(n)
        np.asarray(r.image.x[:4])  # block_until_ready is a no-op here
        done += n
        if done < spp and time.time() - last >= beat_s:
            print(f"  ...{done}/{spp} spp", flush=True)
            last = time.time()


def save_master(out_dir, stem, noisy_r, clean_r):
    os.makedirs(out_dir, exist_ok=True)
    np.savez(
        os.path.join(out_dir, f"{stem}.master.npz"),
        noisy_color=noisy_r.beauty().astype(np.float32),
        noisy_albedo=noisy_r.albedo_image().astype(np.float32),
        noisy_normal=noisy_r.normal_image().astype(np.float32),
        clean_color=clean_r.beauty().astype(np.float32),
        clean_albedo=clean_r.albedo_image().astype(np.float32),
        clean_normal=clean_r.normal_image().astype(np.float32),
    )


def gen_masters():
    for sname, path, train_poses, valid_poses, mega in SCENES:
        scene = load_scene(path)
        scene.set_resolution(RES, RES)
        on_tpu = jax.default_backend() != "cpu"
        # face_chunk=32 for wavefront meshes: at 384x384 the chunk-128
        # batched program kernel-faults the TPU worker (scripts/
        # probe_ship_fault.py bisect: chunk 32 and single-step both fine).
        opts = RenderOptions(
            megakernel=on_tpu and mega,
            face_chunk=32 if not mega else 128,
        )
        noisy_r = Renderer(scene, opts, seed=1)
        clean_r = Renderer(scene, opts, seed=9001)
        t0 = time.time()
        for tag, poses in (("", train_poses), ("valid", valid_poses)):
            for ci, eye in enumerate(poses):
                out_dir = os.path.join(OUT, tag) if tag else OUT
                if os.path.exists(os.path.join(out_dir, f"{sname}_c{ci}.master.npz")):
                    continue  # resumable: skip poses already rendered
                for r in (noisy_r, clean_r):
                    if eye is not None:
                        r.move_camera(position=eye)
                    else:
                        r.reset()
                noisy_r.base_key = jax.random.key(100 + ci + (999 if tag else 0))
                clean_r.base_key = jax.random.key(7000 + ci + (999 if tag else 0))
                noisy_r.step_many(NOISY_SPP)
                _step_bounded(clean_r, CLEAN_SPP)
                save_master(os.path.join(OUT, tag) if tag else OUT,
                            f"{sname}_c{ci}", noisy_r, clean_r)
                print(f"{sname}{'/'+tag if tag else ''}_c{ci} "
                      f"({time.time()-t0:.0f}s)", flush=True)


def gen_dir():
    out_base = OUT + "_dir"
    for sname, path, train_poses, valid_poses in DIR_SCENES:
        scene = load_scene(path)
        scene.set_resolution(DIR_RES, DIR_RES)
        opts = RenderOptions(dir_aov=True, megakernel=False)
        noisy_r = Renderer(scene, opts, seed=2)
        clean_r = Renderer(scene, opts, seed=9002)
        t0 = time.time()
        for tag, poses in (("", train_poses), ("valid", valid_poses)):
            out_dir = os.path.join(out_base, tag) if tag else out_base
            os.makedirs(out_dir, exist_ok=True)
            for ci, eye in enumerate(poses):
                if os.path.exists(os.path.join(out_dir, f"{sname}_c{ci}.input.npy")):
                    continue  # resumable
                for r in (noisy_r, clean_r):
                    if eye is not None:
                        r.move_camera(position=eye)
                    else:
                        r.reset()
                noisy_r.base_key = jax.random.key(300 + ci + (999 if tag else 0))
                clean_r.base_key = jax.random.key(8000 + ci + (999 if tag else 0))
                noisy_r.step_many(DIR_NOISY_SPP)
                _step_bounded(clean_r, DIR_CLEAN_SPP)
                np.save(os.path.join(out_dir, f"{sname}_c{ci}.input.npy"),
                        noisy_r.dir_image().astype(np.float32))
                np.save(os.path.join(out_dir, f"{sname}_c{ci}.target.npy"),
                        clean_r.dir_image().astype(np.float32))
                print(f"dir {sname}{'/'+tag if tag else ''}_c{ci} "
                      f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    if which in ("all", "masters"):
        gen_masters()
    if which in ("all", "dir"):
        gen_dir()
    print("ALLDONE", flush=True)
