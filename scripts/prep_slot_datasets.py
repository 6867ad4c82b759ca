"""Slice the master dataset into per-slot input/target .npy pairs.

Slot recipes (feature table, core/unet.cpp:290-336):
    rt_ldr / rt_hdr:              noisy color            -> clean color
    rt_ldr_alb / rt_hdr_alb:      + noisy albedo
    rt_ldr_alb_nrm / rt_hdr_...:  + noisy normal
    rt_ldr_calb_cnrm / rt_hdr_..: noisy color + CLEAN aux -> clean color
    rt_alb:                       noisy albedo           -> clean albedo
    rt_nrm:                       noisy normal           -> clean normal
    rtlightmap_hdr:               noisy color (log tf)   -> clean color
"""

import glob
import os
import sys

import numpy as np

MASTER = sys.argv[1] if len(sys.argv) > 1 else "data/master"
OUT_BASE = sys.argv[2] if len(sys.argv) > 2 else "data/slots"


def recipe(m, slot):
    nc, na, nn = m["noisy_color"], m["noisy_albedo"], m["noisy_normal"]
    cc, ca, cn = m["clean_color"], m["clean_albedo"], m["clean_normal"]
    if slot in ("rt_ldr", "rt_hdr", "rtlightmap_hdr"):
        return nc, cc
    if slot in ("rt_ldr_alb", "rt_hdr_alb"):
        return np.concatenate([nc, na], -1), cc
    if slot in ("rt_ldr_alb_nrm", "rt_hdr_alb_nrm"):
        return np.concatenate([nc, na, nn], -1), cc
    if slot in ("rt_ldr_calb_cnrm", "rt_hdr_calb_cnrm"):
        return np.concatenate([nc, ca, cn], -1), cc
    if slot == "rt_alb":
        return na, ca
    if slot == "rt_nrm":
        return nn, cn
    raise ValueError(slot)


def main():
    slots = sys.argv[3].split(",") if len(sys.argv) > 3 else [
        "rt_ldr_alb_nrm", "rt_hdr_alb_nrm", "rt_ldr_calb_cnrm",
        "rt_hdr_calb_cnrm", "rt_alb", "rt_nrm", "rt_hdr", "rtlightmap_hdr",
    ]
    masters = sorted(glob.glob(os.path.join(MASTER, "*.master.npz")))
    assert masters, f"no master files in {MASTER}"
    for slot in slots:
        out = os.path.join(OUT_BASE, slot)
        os.makedirs(out, exist_ok=True)
        for path in masters:
            m = np.load(path)
            x, y = recipe(m, slot)
            stem = os.path.basename(path).replace(".master.npz", "")
            np.save(os.path.join(out, f"{stem}.input.npy"), x)
            np.save(os.path.join(out, f"{stem}.target.npy"), y)
        print(f"{slot}: {len(masters)} pairs", flush=True)


if __name__ == "__main__":
    main()
