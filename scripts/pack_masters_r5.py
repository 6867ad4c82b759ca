"""Pack the denoiser master pool into a committable fp16 archive (and
restore it on a fresh machine) — VERDICT r4 weak #7 / next #6: the ~3 GB
fp32 pool lives outside git on a disposable VM, so every round used to
open with a multi-hour TPU regen before any training could continue.

fp16 + zlib shrinks the pool ~13x (~250 MB total — measured ratio 0.076),
which git carries fine. fp16 quantization error (~5e-4 relative) sits far
below both the 16-spp input noise and the ~0.01 MC noise floor of the
2048-spp ground truths, so keep-best continuation trains identically in
practice; rounds that want bit-fresh fp32 GT still run the gen scripts
(both pack and unpack skip files that already exist, so the fp32 pool
always wins when present).

  pack:    data/master_r2/**/*.master.npz  -> data/master_pack/**/*.npz
           data/master_r2_dir/**/*.npy     -> data/master_pack/dir/**/*.npz
  unpack:  the reverse (restores .master.npz / .npy files, fp32 dtype)

Run: python scripts/pack_masters_r5.py pack|unpack
"""

import glob
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MASTER = os.path.join(REPO, "data/master_r2")
DIR_DATA = os.path.join(REPO, "data/master_r2_dir")
PACK = os.path.join(REPO, "data/master_pack")


def pack():
    n = 0
    for src in sorted(glob.glob(os.path.join(MASTER, "**/*.master.npz"),
                                recursive=True)):
        rel = os.path.relpath(src, MASTER)
        dst = os.path.join(PACK, rel)
        if os.path.exists(dst):
            continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        m = np.load(src)
        np.savez_compressed(dst, **{k: m[k].astype(np.float16)
                                    for k in m.files})
        n += 1
    # dir pairs are bare .npy; pack each as a one-array npz
    for src in sorted(glob.glob(os.path.join(DIR_DATA, "**/*.npy"),
                                recursive=True)):
        rel = os.path.relpath(src, DIR_DATA)
        dst = os.path.join(PACK, "dir", rel.replace(".npy", ".npz"))
        if os.path.exists(dst):
            continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        np.savez_compressed(dst, a=np.load(src).astype(np.float16))
        n += 1
    print(f"packed {n} new files into {PACK}", flush=True)


def unpack():
    n = 0
    for src in sorted(glob.glob(os.path.join(PACK, "**/*.npz"),
                                recursive=True)):
        rel = os.path.relpath(src, PACK)
        if rel.startswith("dir" + os.sep):
            dst = os.path.join(DIR_DATA,
                               rel[len("dir" + os.sep):].replace(".npz", ".npy"))
            if os.path.exists(dst):
                continue
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            np.save(dst, np.load(src)["a"].astype(np.float32))
        else:
            dst = os.path.join(MASTER, rel)
            if os.path.exists(dst):
                continue
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            m = np.load(src)
            np.savez(dst, **{k: m[k].astype(np.float32) for k in m.files})
        n += 1
    print(f"unpacked {n} files", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "pack"
    {"pack": pack, "unpack": unpack}[mode]()
    print("ALLDONE", flush=True)
