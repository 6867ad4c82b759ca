"""Round-2 denoiser quality campaign: slice slots, train (device-resident),
export TZA, evaluate RMSE/PSNR on held-out poses.

Stages (run on TPU; each is resumable):
    prep   — slice data/master_r2 into per-slot train arrays + valid dirs
    train  — train the listed slots with train_device, export weights/<>.tza
    eval   — denoise held-out 16 spp poses per slot, RMSE/PSNR vs 2048 spp
             ground truth; writes results/r2_eval.json

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/campaign_r2.py <stage> [slots-csv] [epochs]
"""

import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

MASTER = "data/master_r2"
SLOTS_DIR = "data/slots_r2"
DIR_DATA = "data/master_r2_dir"

# Trainer shape knobs (module-level so smoke tests can shrink them).
STEPS_PER_EPOCH = 32
BATCH_SIZE = 16
WEIGHTS_DIR = "weights"
RESULTS_DIR = "results/r2"
# Warm-start directory: when set, each slot with no checkpoint of its own
# initializes from <INIT_DIR>/<slot>'s latest checkpoint (fresh optimizer).
INIT_DIR = ""
# Peak-LR multiplier (fine-tune rounds run a gentler OneCycle).
LR_SCALE = 1.0
# Per-step params-EMA decay (0 = off; round-3c fine-tunes set 0.999 —
# validation/export then use the averaged weights, see TrainConfig.ema).
EMA = 0.0

ALL_SLOTS = [
    "rt_hdr_alb", "rt_ldr_alb", "rt_hdr_alb_nrm", "rt_ldr_alb_nrm",
    "rt_hdr", "rt_ldr", "rt_hdr_calb_cnrm", "rt_ldr_calb_cnrm",
    "rt_alb", "rt_nrm", "rtlightmap_hdr", "rtlightmap_dir",
]


def slot_cfg_fields(name):
    """Transfer config mirroring the runtime (core/unet.cpp:613-621,693-763)."""
    if name == "rtlightmap_dir":
        return dict(transfer="linear", hdr=False, snorm=True)
    if name.startswith("rtlightmap"):
        return dict(transfer="log", hdr=True, snorm=False)
    if name == "rt_nrm":
        return dict(transfer="linear", hdr=False, snorm=True)
    if name == "rt_alb":
        return dict(transfer="srgb", hdr=False, snorm=False)
    return dict(transfer="pu" if "hdr" in name else "srgb",
                hdr="hdr" in name, snorm=False)


def recipe(m, slot):
    nc, na, nn = m["noisy_color"], m["noisy_albedo"], m["noisy_normal"]
    cc, ca, cn = m["clean_color"], m["clean_albedo"], m["clean_normal"]
    ldr = "ldr" in slot
    if ldr:
        nc, cc = np.clip(nc, 0, 1), np.clip(cc, 0, 1)
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


def stage_prep():
    for slot in ALL_SLOTS:
        if slot == "rtlightmap_dir":
            continue  # generated directly by gen_dataset_r2.py
        for sub in ("", "valid"):
            src = os.path.join(MASTER, sub) if sub else MASTER
            masters = sorted(glob.glob(os.path.join(src, "*.master.npz")))
            if not masters:
                continue
            out = os.path.join(SLOTS_DIR, slot, sub) if sub else os.path.join(
                SLOTS_DIR, slot)
            os.makedirs(out, exist_ok=True)
            for path in masters:
                stem = os.path.basename(path).replace(".master.npz", "")
                # Incremental: masters are content-stable once written (gen
                # scripts resume by skipping existing files), so a slice pair
                # that exists is current — lets prep run mid-generation and
                # again after, paying only for the new masters.
                if os.path.exists(os.path.join(out, f"{stem}.target.npy")):
                    continue
                m = np.load(path)
                x, y = recipe(m, slot)
                np.save(os.path.join(out, f"{stem}.input.npy"), x)
                np.save(os.path.join(out, f"{stem}.target.npy"), y)
        print(f"prep {slot} done", flush=True)


def _latest_ckpt_path(result_dir):
    import re
    best, best_ep = "", -1
    if os.path.isdir(result_dir):
        for fn in os.listdir(result_dir):
            m = re.fullmatch(r"checkpoint_(\d+)\.pkl", fn)
            if m and int(m.group(1)) > best_ep:
                best_ep = int(m.group(1))
                best = os.path.join(result_dir, fn)
    return best


def _warm_start(slot):
    """Fine-tune init: prefer INIT_DIR's checkpoint; fall back to the
    committed weights/<slot>.tza export (checkpoints live outside git, so a
    fresh machine only has the TZA form of the previous round's params)."""
    if not INIT_DIR:
        return ""
    ckpt = _latest_ckpt_path(os.path.join(INIT_DIR, slot))
    if ckpt:
        return ckpt
    tza = os.path.join(WEIGHTS_DIR, f"{slot}.tza")
    return tza if os.path.exists(tza) else ""


def load_stack(d):
    xs, ys = [], []
    for ip in sorted(glob.glob(os.path.join(d, "*.input.npy"))):
        tp = ip.replace(".input.npy", ".target.npy")
        xs.append(np.load(ip))
        ys.append(np.load(tp))
    return np.stack(xs), np.stack(ys)


def stage_train(slots, epochs, stacks=None):
    """stacks: optional {slot: (x, y)} of pre-built (possibly device-
    resident) train arrays — skips the per-slot disk load + fp32 re-upload
    (the round-3 slot stacks cost ~minutes each through the axon tunnel;
    a shared plane cache uploads the master pool once, see
    scripts/run_campaign_r3c.py)."""
    from mygpuraytracer_tpu.denoise.weights import WEIGHTS_CHANNELS
    from mygpuraytracer_tpu.train.export import export_weights
    from mygpuraytracer_tpu.train.train import TrainConfig, train_device

    for slot in slots:
        data_dir = DIR_DATA if slot == "rtlightmap_dir" else os.path.join(
            SLOTS_DIR, slot)
        if stacks is not None and slot in stacks:
            x, y = stacks[slot]
        else:
            x, y = load_stack(data_dir)
        # Fragile surfaces: the MS-SSIM term blows up deterministically on
        # HDR (pu/log) values near the OneCycle peak (rt_hdr_alb -> 1e7 loss
        # at BOTH 3e-4 and 1e-4, clean bounded data, grad-clip active), and
        # the 9-channel tiers diverge within the warmup even on LDR
        # (rt_ldr_alb_nrm -> loss 45 by epoch 56). Those train on plain L1
        # (also an OIDN-supported loss) at a 1e-4 peak; measured quality
        # matches (rt_hdr_alb/L1 31.7 dB vs rt_ldr_alb/l1_msssim 32.1 dB)
        # and L1 is 2.2x faster (no SSIM pyramid).
        fragile = slot_cfg_fields(slot)["hdr"] or WEIGHTS_CHANNELS[slot] >= 9
        cfg = TrainConfig(
            data_dir=data_dir,
            result_dir=os.path.join(RESULTS_DIR, slot),
            in_channels=WEIGHTS_CHANNELS[slot],
            loss="l1" if fragile else "l1_msssim",
            num_epochs=epochs,
            steps_per_epoch=STEPS_PER_EPOCH,
            batch_size=BATCH_SIZE,
            # snap to a power of two <= the image height: the U-Net pools 4x,
            # so a non-pow2 tile (e.g. 192 from an intermediate-height smoke
            # dataset) would fail at shape-build time
            tile_size=1 << min(256, x.shape[1]).bit_length() - 1,
            max_lr=(1e-4 if fragile else 3e-4) * LR_SCALE,
            ema=EMA,
            precision="mixed",
            save_epochs=max(epochs // 10, 1),
            valid_epochs=max(epochs // 20, 1),
            init_from=_warm_start(slot),
            **slot_cfg_fields(slot),
        )
        last = {}
        # .get defaults: control records (early_stop / diverged) don't carry
        # the per-epoch keys — a KeyError here killed a whole campaign run.
        params = train_device(cfg, x, y, log_fn=lambda r: (
            last.update(r),
            print(f"[{slot}] epoch {r['epoch']} loss {r.get('loss', 0.0):.4f}"
                  + (f" valid {r['valid_loss']:.4f}" if 'valid_loss' in r else "")
                  + (" EARLY-STOP" if r.get("early_stop") else "")
                  + (" DIVERGED" if r.get("diverged") else "")
                  + f" ({r.get('images_per_sec', 0.0):.0f} img/s)", flush=True)
            if r["epoch"] % 50 == 0 or "valid_loss" in r
            or "early_stop" in r or "diverged" in r else None,
        ))
        os.makedirs(WEIGHTS_DIR, exist_ok=True)
        out_tza = os.path.join(WEIGHTS_DIR, f"{slot}.tza")
        export_weights(params, out_tza)
        print(f"[{slot}] exported {out_tza}; last: {last}", flush=True)


def stage_eval(slots):
    """Full-image denoise of held-out poses; RMSE/PSNR vs ground truth."""
    from mygpuraytracer_tpu.denoise import weights as _weights
    from mygpuraytracer_tpu.denoise.weights import load_default_params
    from mygpuraytracer_tpu.train.infer import Infer, psnr, rmse

    # The runtime caches loaded weight blobs per process; evals run in the
    # same long-lived process that just re-exported them, so drop the cache
    # or post-training evals silently score the pre-training weights.
    _weights._cache.clear()

    eval_path = RESULTS_DIR.rstrip("/") + "_eval.json"
    results = {}
    if os.path.exists(eval_path):  # merge: per-slot incremental eval
        with open(eval_path) as fh:
            results = json.load(fh)
    masters = sorted(glob.glob(os.path.join(MASTER, "valid", "*.master.npz")))
    for slot in slots:
        if slot in ("rt_alb", "rt_nrm", "rtlightmap_dir", "rtlightmap_hdr"):
            continue  # aux/lightmap slots evaluated separately below
        params, rnd = load_default_params(slot)
        if rnd:
            print(f"[{slot}] RANDOM weights — skipping eval", flush=True)
            continue
        f = slot_cfg_fields(slot)
        infer = Infer(params, transfer=f["transfer"], hdr=f["hdr"])
        if "calb" in slot:
            pa, ra = load_default_params("rt_alb")
            pn, rn = load_default_params("rt_nrm")
            if not (ra or rn):
                infer.aux_infers = {
                    "albedo": Infer(pa, transfer="srgb"),
                    "normal": Infer(pn, snorm=True),
                }
        rs, ps, ns = [], [], []
        for path in masters:
            m = np.load(path)
            x, y = recipe(m, slot)
            if f["hdr"]:
                # Serve-path parity: the runtime autoexposes the input color
                # (unet.cpp:134-144; filter.py _execute_impl), and since the
                # round-5 exposure fix training normalizes the same way
                # (train.py make_preprocess) — evaluate behind the same
                # scale or the eval scores a pipeline nobody serves.
                from mygpuraytracer_tpu.denoise.color import autoexposure
                import jax.numpy as _jnp
                infer.transfer.input_scale = float(
                    autoexposure(_jnp.asarray(x[..., :3])))
            out = infer(x)
            gt = np.clip(y, 0, 1) if "ldr" in slot else y
            pred = np.clip(out, 0, 1) if "ldr" in slot else out
            rs.append(rmse(pred, gt))
            ps.append(psnr(np.clip(pred, 0, 1), np.clip(gt, 0, 1)))
            ns.append(psnr(np.clip(x[..., :3], 0, 1), np.clip(gt, 0, 1)))
        results[slot] = {
            "rmse": float(np.mean(rs)),
            "psnr": float(np.mean(ps)),
            "noisy_psnr": float(np.mean(ns)),
            "poses": len(masters),
        }
        print(f"[{slot}] RMSE {results[slot]['rmse']:.5f} "
              f"PSNR {results[slot]['psnr']:.2f} "
              f"(noisy {results[slot]['noisy_psnr']:.2f})", flush=True)

    # aux prefilters + lightmaps: RMSE in their own domain
    from mygpuraytracer_tpu.train.infer import Infer as _I

    for slot, d in (("rt_alb", None), ("rt_nrm", None),
                    ("rtlightmap_hdr", None), ("rtlightmap_dir", DIR_DATA)):
        if slot not in slots:
            continue
        params, rnd = load_default_params(slot)
        if rnd:
            continue
        f = slot_cfg_fields(slot)
        infer = _I(params, transfer=f["transfer"], hdr=f["hdr"], snorm=f["snorm"])
        vdir = os.path.join(d or os.path.join(SLOTS_DIR, slot), "valid")
        rs = []
        for ip in sorted(glob.glob(os.path.join(vdir, "*.input.npy"))):
            x = np.load(ip)
            y = np.load(ip.replace(".input.npy", ".target.npy"))
            if f["hdr"]:
                from mygpuraytracer_tpu.denoise.color import autoexposure
                import jax.numpy as _jnp
                infer.transfer.input_scale = float(
                    autoexposure(_jnp.asarray(x[..., :3])))
            out = infer(x)
            if slot == "rt_alb":
                # the albedo AOV stores emitters as emittance*color (ke*5,
                # shade path iter==1 rule); the LDR prefilter trains and
                # denoises in the clamped [0,1] domain — score it there.
                out, y = np.clip(out, 0, 1), np.clip(y, 0, 1)
            rs.append(rmse(out, y))
        if rs:
            results[slot] = {"rmse": float(np.mean(rs)), "poses": len(rs)}
            print(f"[{slot}] RMSE {results[slot]['rmse']:.5f}", flush=True)

    os.makedirs("results", exist_ok=True)
    with open(eval_path, "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    stage = sys.argv[1]
    slots = sys.argv[2].split(",") if len(sys.argv) > 2 and sys.argv[2] else ALL_SLOTS
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    if stage == "prep":
        stage_prep()
    elif stage == "train":
        stage_train(slots, epochs)
    elif stage == "eval":
        stage_eval(slots)
    else:
        raise SystemExit(f"unknown stage {stage}")
    print("ALLDONE", flush=True)
