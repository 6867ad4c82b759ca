"""Round-3c keep-best campaign: fine-tune every slot on the full upgraded
pool, export only blobs that eval BETTER than the committed ones.

Differences from run_campaign_r3.py (whose stage_train exports
unconditionally — a regression risk for the slots already fine-tuned this
round):

- keep-best: each slot is evaluated before and after training against the
  upgraded ground truth; the worse blob is restored (run_second_ft_r3's
  protocol, generalized to all slots).
- device-resident plane cache: the master pool's six planes are uploaded
  ONCE and every slot's train stack is composed on-device (concat/clip) —
  the per-slot fp32 re-upload through the axon tunnel was the single
  largest fixed cost of the round-3 campaign (~minutes per slot).
- per-slot epoch budgets + an optional deadline file (/tmp/r3c_deadline,
  unix seconds): when passed, remaining slots are skipped and the campaign
  still prints its completion marker so the queue can finish cleanly.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/run_campaign_r3c.py [slots-csv] [epoch-override]
"""

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np

import campaign_r2 as c

c.SLOTS_DIR = "data/slots_r3"
c.RESULTS_DIR = "results/r3c"
c.INIT_DIR = "results/_tza_warm_start_only"  # no such dir -> TZA fallback
c.LR_SCALE = 0.5
c.EMA = 0.999  # validate/export the params EMA (keep-best protects)

DEADLINE_FILE = "/tmp/r3c_deadline"

# (slot, epochs) in training order: weakest-first, aux prefilters before the
# calb/cnrm slots whose eval chains through them, the already-good bench
# slot last (it gets a final pass on the mesh-enriched pool; keep-best
# protects the banked result).
PLAN = [
    ("rt_hdr_alb", 800),
    ("rt_hdr", 700),
    ("rt_alb", 500),
    ("rt_nrm", 400),
    ("rt_ldr", 700),
    ("rt_ldr_alb_nrm", 600),
    ("rt_hdr_alb_nrm", 600),
    ("rt_ldr_calb_cnrm", 500),
    ("rt_hdr_calb_cnrm", 500),
    ("rtlightmap_hdr", 400),
    ("rtlightmap_dir", 400),
    ("rt_ldr_alb", 600),
]

PLANES = ("noisy_color", "noisy_albedo", "noisy_normal",
          "clean_color", "clean_albedo", "clean_normal")


def load_plane_cache():
    """Upload the master pool's six planes once; returns {name: [P,H,W,3]}
    device arrays. Only TRAIN masters (valid poses are evaluated full-size
    from disk by stage_eval)."""
    import jax.numpy as jnp

    masters = sorted(glob.glob(os.path.join(c.MASTER, "*.master.npz")))
    host = {k: [] for k in PLANES}
    for p in masters:
        m = np.load(p)
        for k in PLANES:
            host[k].append(m[k])
    dev = {}
    for k in PLANES:
        dev[k] = jnp.asarray(np.stack(host[k]), jnp.float32)
        host[k] = None  # free host copy as we go
    return dev


def recipe_dev(dev, slot):
    """c.recipe, but composing on-device (np.concatenate on jax arrays
    would silently round-trip through host memory)."""
    import jax.numpy as jnp

    nc, na, nn = dev["noisy_color"], dev["noisy_albedo"], dev["noisy_normal"]
    cc, ca, cn = dev["clean_color"], dev["clean_albedo"], dev["clean_normal"]
    if "ldr" in slot:
        nc, cc = jnp.clip(nc, 0, 1), jnp.clip(cc, 0, 1)
    if slot in ("rt_ldr", "rt_hdr", "rtlightmap_hdr"):
        return nc, cc
    if slot in ("rt_ldr_alb", "rt_hdr_alb"):
        return jnp.concatenate([nc, na], -1), cc
    if slot in ("rt_ldr_alb_nrm", "rt_hdr_alb_nrm"):
        return jnp.concatenate([nc, na, nn], -1), cc
    if slot in ("rt_ldr_calb_cnrm", "rt_hdr_calb_cnrm"):
        return jnp.concatenate([nc, ca, cn], -1), cc
    if slot == "rt_alb":
        return na, ca
    if slot == "rt_nrm":
        return nn, cn
    raise ValueError(slot)


def prep_valid_slices():
    """Slice only the valid/ dirs (ValidationDataset + aux eval read them
    from disk); train stacks come from the plane cache instead."""
    for slot in c.ALL_SLOTS:
        if slot == "rtlightmap_dir":
            continue
        src = os.path.join(c.MASTER, "valid")
        masters = sorted(glob.glob(os.path.join(src, "*.master.npz")))
        out = os.path.join(c.SLOTS_DIR, slot, "valid")
        os.makedirs(out, exist_ok=True)
        for path in masters:
            stem = os.path.basename(path).replace(".master.npz", "")
            tgt = os.path.join(out, f"{stem}.target.npy")
            if os.path.exists(tgt) and os.path.getmtime(path) < os.path.getmtime(tgt):
                continue
            m = np.load(path)
            x, y = c.recipe(m, slot)
            np.save(os.path.join(out, f"{stem}.input.npy"), x)
            np.save(tgt, y)
    print("valid slices ready", flush=True)


def eval_rmse(slot):
    c.stage_eval([slot])
    # derived at call time: tests repoint c.RESULTS_DIR after import
    with open(c.RESULTS_DIR.rstrip("/") + "_eval.json") as fh:
        return json.load(fh)[slot]["rmse"]


def keep_path(slot):
    return f"/tmp/pre_r3c_{slot}.tza"


def past_deadline():
    if not os.path.exists(DEADLINE_FILE):
        return False
    with open(DEADLINE_FILE) as fh:
        return time.time() > float(fh.read().strip())


def run(plan, only=None, override=0):
    t0 = time.time()
    prep_valid_slices()
    dev = None
    for slot, epochs in plan:
        if only and slot not in only:
            continue
        done_flag = os.path.join(c.RESULTS_DIR, slot, "DONE")
        if os.path.exists(done_flag):
            print(f"### {slot} already done; skipping", flush=True)
            continue
        if past_deadline():
            print(f"### deadline passed; skipping {slot}", flush=True)
            continue
        if dev is None and slot != "rtlightmap_dir":
            t1 = time.time()
            dev = load_plane_cache()
            print(f"plane cache up ({time.time()-t1:.0f}s, "
                  f"{dev['noisy_color'].shape[0]} poses)", flush=True)
        tza = os.path.join(c.WEIGHTS_DIR, f"{slot}.tza")
        keep = keep_path(slot)
        # Refresh the restore point at EVERY slot visit: it must hold the
        # best-so-far blob (= the one `base` is about to score), not the
        # pre-campaign one. With the stale-keep behavior a pass-2 regression
        # restored the pass-1-PRE blob and silently discarded pass-1's gain.
        shutil.copy(tza, keep)
        base = eval_rmse(slot)
        print(f"### {slot} baseline vs upgraded GT: {base:.5f}", flush=True)
        t1 = time.time()
        stacks = (None if slot == "rtlightmap_dir"
                  else {slot: recipe_dev(dev, slot)})
        c.stage_train([slot], override or epochs, stacks=stacks)
        new = eval_rmse(slot)
        print(f"### {slot}: {base:.5f} -> {new:.5f} "
              f"({time.time()-t1:.0f}s)", flush=True)
        verdict = "kept-new"
        if new > base:
            shutil.copy(keep, tza)
            final = eval_rmse(slot)  # restore the honest row
            verdict = f"restored-previous ({final:.5f})"
        os.makedirs(os.path.dirname(done_flag), exist_ok=True)
        with open(done_flag, "w") as f:
            f.write(f"{base:.5f} -> {new:.5f}; {verdict}\n")
        print(f"### {slot} {verdict}", flush=True)
    print(f"CAMPAIGN DONE ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    only_arg = (sys.argv[1].split(",") if len(sys.argv) > 1 and sys.argv[1]
                else None)
    override_arg = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    run(PLAN, only=only_arg, override=override_arg)
