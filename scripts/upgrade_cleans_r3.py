"""Upgrade primitive-scene CLEAN targets to 16384 spp (in place).

Why: the 2048-spp (384^2) / 1024-spp (800^2) clean renders carry residual
Monte-Carlo noise of 0.029 / 0.042 display-domain RMSE (measured from
paired 16-spp realizations: sigma_16 = 0.333, scaled by 1/sqrt(spp)).
That noise (a) is learned by the denoiser as target statistics — worst
exactly at the bench's 800^2 scale — and (b) puts a hard floor under every
eval row, 3-4x above the 1e-2 quality bar the campaign chases
(/root/reference/training/train.py:228-269 evaluates against *converged*
ground truth for the same reason).

At 16384 spp the floor drops to ~0.010 (384^2 compute ~9 s/pose, 800^2
~40 s/pose on the megakernel tier). Mesh scenes (shipTex/cottage) are NOT
upgraded: their 1024-spp cleans cost ~18 min/pose on the wavefront tier
as-is, and another 16x is out of budget — their eval rows stay
floor-limited (documented in docs/STATUS.md). sphere is skipped too:
sigma_16 = 0.009 makes its 2048-spp floor 8e-4, already negligible.

In-place rewrite: every dependent npz (base master, rK noisy realizations,
800^2 corner tiles) gets its clean_* planes replaced and a clean_spp
marker field; files already carrying clean_spp >= TARGET are skipped, so
the script is resumable and idempotent. Slot slices under data/slots_r3
are NOT touched here — delete + re-prep them after (see
scripts/run_r3_resume2.sh).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/upgrade_cleans_r3.py
"""

import glob
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np

import jax

from gen_dataset_r2 import OUT, REF, _ring_poses, _step_bounded
from gen_dataset_r3b import RES_BENCH, _planes, _tiles
from mygpuraytracer_tpu.config import RenderOptions
from mygpuraytracer_tpu.render import Renderer
from mygpuraytracer_tpu.scene import load_scene

TARGET_SPP = 16384

# (scene-stem, scene file, train poses, valid poses, resolution) — pose
# lists MUST reproduce gen_dataset_r2.SCENES / gen_dataset_r3b.R3B_SCENES
# exactly (same _ring_poses seeds) so the re-render matches each master's
# camera.
JOBS = [
    ("cornell", f"{REF}/cornell.txt",
     [None] + _ring_poses(13, 10), _ring_poses(3, 11), 384),
    ("glass", f"{REF}/cornellGlass.txt",
     [None] + _ring_poses(11, 20), _ring_poses(3, 21), 384),
    ("cornell800", f"{REF}/cornell.txt",
     [None] + _ring_poses(5, 90), _ring_poses(2, 91), RES_BENCH),
    ("glass800", f"{REF}/cornellGlass.txt",
     [None] + _ring_poses(3, 92), _ring_poses(1, 93), RES_BENCH),
]


def _deps(out_dir, stem, tiled):
    """All npz files sharing this pose's clean planes."""
    if tiled:
        pats = [f"{stem}t[0-3].master.npz", f"{stem}r[0-9]t[0-3].master.npz",
                f"{stem}.master.npz"]  # valid poses are saved full-size
    else:
        pats = [f"{stem}.master.npz", f"{stem}r[0-9].master.npz"]
    out = []
    for p in pats:
        out.extend(sorted(glob.glob(os.path.join(out_dir, p))))
    return out


def _needs_upgrade(paths):
    for p in paths:
        with np.load(p) as m:
            if "clean_spp" not in m or int(m["clean_spp"]) < TARGET_SPP:
                return True
    return False


def _rewrite(path, clean_planes, crop=None):
    with np.load(path) as m:
        d = {k: m[k] for k in m.files}
    for k, v in clean_planes.items():
        vv = v if crop is None else v[crop[0]:crop[0] + crop[2],
                                      crop[1]:crop[1] + crop[2]]
        assert d[f"clean_{k}"].shape == vv.shape, (path, k)
        d[f"clean_{k}"] = vv
    d["clean_spp"] = np.int32(TARGET_SPP)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **d)
    os.replace(tmp, path)


def main():
    on_tpu = jax.default_backend() != "cpu"
    spp = TARGET_SPP if on_tpu else 64  # CPU smoke mode
    # CPU smoke runs write 64-spp cleans — never into the real pool.
    out_root = os.environ.get("UPGRADE_OUT", OUT)
    assert on_tpu or out_root != OUT, (
        "CPU smoke mode would clobber real masters; set UPGRADE_OUT")
    for sname, path, train_poses, valid_poses, res in JOBS:
        scene = load_scene(path)
        scene.set_resolution(res, res)
        clean_r = Renderer(scene, RenderOptions(megakernel=on_tpu), seed=9007)
        t0 = time.time()
        for tag, poses in (("", train_poses), ("valid", valid_poses)):
            out_dir = os.path.join(out_root, tag) if tag else out_root
            tiled = res == RES_BENCH and not tag
            for ci, eye in enumerate(poses):
                stem = f"{sname}_c{ci}"
                deps = _deps(out_dir, stem, tiled)
                if not deps:
                    print(f"{stem}: no masters on disk; skipping", flush=True)
                    continue
                if not _needs_upgrade(deps):
                    continue
                if eye is not None:
                    clean_r.move_camera(position=eye)
                else:
                    clean_r.reset()
                # fresh, independent stream (any seed != the noisy streams)
                clean_r.base_key = jax.random.key(77000 + ci + (999 if tag else 0))
                _step_bounded(clean_r, spp, batch=256)
                planes = _planes(clean_r)
                for dep in deps:
                    crop = None
                    m = re.fullmatch(
                        re.escape(stem) + r"(?:r\d)?(?:t(\d))?\.master\.npz",
                        os.path.basename(dep))
                    if m and m.group(1) is not None:
                        t = int(m.group(1))
                        crop = ((0, res - 384)[t // 2], (0, res - 384)[t % 2], 384)
                    _rewrite(dep, planes, crop)
                print(f"{stem}{'/' + tag if tag else ''}: {len(deps)} files "
                      f"upgraded ({time.time() - t0:.0f}s)", flush=True)
    print("UPGRADE DONE", flush=True)


if __name__ == "__main__":
    main()
