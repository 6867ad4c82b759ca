"""U-Net trainer: data-parallel over a jax.sharding.Mesh.

TPU-native port of training/train.py (T2): the reference spawns one process
per GPU and wraps the model in DDP over NCCL (util.py:102-124), all-reducing
gradients and scalar losses. Here a single process drives every device:
the batch is sharded over the mesh's 'dp' axis with NamedSharding and XLA
inserts the gradient all-reduce over ICI — the pjit equivalent of DDP.

Kept from the reference: Adam + one-cycle cosine schedule with 15% warmup
(train.py:129-147), default loss L1+MS-SSIM 0.16/0.84, mixed precision
(bfloat16 activations, f32 master weights — AMP's TPU analog), periodic
checkpoint save/auto-resume with config-mismatch detection (train.py:59-140),
periodic validation, and JSONL metric logs in place of TensorBoard.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..denoise.unet import init_unet_params, unet_apply
from .dataset import TileDataset, ValidationDataset
from .losses import get_loss_function


@dataclasses.dataclass
class TrainConfig:
    """Defaults follow training/config.py: 2000 epochs, bs 16, 256^2 tiles,
    l1_msssim loss, mixed precision."""

    data_dir: str = ""
    # Validation pairs directory (deterministic tile grid, evaluated every
    # valid_epochs — reference training/train.py:228-269). Empty -> uses
    # <data_dir>/valid when that exists, else validation is skipped.
    valid_dir: str = ""
    result_dir: str = "results/rt"
    in_channels: int = 6  # color+albedo
    loss: str = "l1_msssim"
    num_epochs: int = 2000
    steps_per_epoch: int = 32
    batch_size: int = 16
    tile_size: int = 256
    max_lr: float = 2e-4
    warmup_pct: float = 0.15
    precision: str = "mixed"  # 'mixed' (bf16 compute) or 'float32'
    # Transfer applied to color channels before the net — MUST match the
    # runtime filter's input packing ('srgb' for the LDR RT filter, 'pu' for
    # HDR, input_reorder.ispc:34-52; training/dataset.py applies the same).
    transfer: str = "srgb"
    hdr: bool = False  # HDR color range (clamp to +inf instead of 1)
    snorm: bool = False  # signed-normalized input/target (normal prefilter)
    seed: int = 42
    save_epochs: int = 10
    valid_epochs: int = 10
    # Warm start: path to a checkpoint .pkl whose params initialize training
    # when the result_dir has no checkpoint of its own (fresh optimizer +
    # schedule — fine-tuning a previous round's weights on new data).
    init_from: str = ""
    # Per-step exponential moving average of params (0 disables). When on,
    # validation/best-valid/export all use the EMA weights — the averaged
    # point sits in a flatter spot of the loss surface than any single SGD
    # iterate (standard for image-restoration nets; the short fine-tune
    # regimes here check validation only every ~epochs/20, so the EMA also
    # de-noises the best-valid selection between checks).
    ema: float = 0.0

    def check_compatible(self, other: dict):
        """Config mismatch detection on resume (train.py:68-99)."""
        for key in ("in_channels", "loss", "tile_size", "precision"):
            if other.get(key) != getattr(self, key):
                raise ValueError(
                    f"config mismatch on resume: {key} {other.get(key)} != {getattr(self, key)}"
                )


def make_mesh(num_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), ("dp",))


def _checkpoint_path(result_dir: str, epoch: int) -> str:
    return os.path.join(result_dir, f"checkpoint_{epoch}.pkl")


def save_checkpoint(result_dir, epoch, step, params, opt_state, cfg: TrainConfig,
                    ema_params=None):
    os.makedirs(result_dir, exist_ok=True)
    state = {
        "epoch": epoch,
        "step": step,
        "params": jax.device_get(params),
        "opt_state": jax.device_get(opt_state),
    }
    if ema_params is not None:
        state["ema_params"] = jax.device_get(ema_params)
    with open(_checkpoint_path(result_dir, epoch), "wb") as f:
        pickle.dump(state, f)
    with open(os.path.join(result_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)


def latest_checkpoint(result_dir: str):
    if not os.path.isdir(result_dir):
        return None
    epochs = []
    for fn in os.listdir(result_dir):
        if fn.startswith("checkpoint_") and fn.endswith(".pkl"):
            epochs.append(int(fn[len("checkpoint_") : -len(".pkl")]))
    if not epochs:
        return None
    epoch = max(epochs)
    with open(_checkpoint_path(result_dir, epoch), "rb") as f:
        return pickle.load(f)


def load_init_params(path: str):
    """Warm-start params from a checkpoint pickle OR an exported .tza blob.

    The TZA path exists because checkpoints live outside git: a fresh
    machine keeps only the committed weights/<slot>.tza exports, which are
    exactly the trained params (export.py is lossless fp32 oihw<->HWIO)."""
    if path.endswith(".tza"):
        from ..denoise.tza import read_tza
        from ..denoise.unet import params_from_tza

        return params_from_tza(read_tza(path))
    with open(path, "rb") as f:
        return pickle.load(f)["params"]


def make_preprocess(cfg: TrainConfig):
    """Mirror the runtime input packing (input_reorder.ispc): color channels
    sanitized to [0,1] + transfer-encoded; albedo clamped; normals
    snorm-shifted; target encoded the same way. Keeps SSIM statistics and
    gradients in [0,1] — raw linear radiance (light pixels ~ 5*pi)
    destabilizes training."""
    from ..denoise import color as color_mod

    tf = color_mod.make_transfer(cfg.transfer)

    def preprocess(x, y):
        if cfg.snorm:
            # signed-normalized filter (rt_nrm): [-1,1] -> [0,1], linear tf
            col = color_mod.sanitize(x[..., :3], -1.0, 1.0) * 0.5 + 0.5
            y = color_mod.sanitize(y, -1.0, 1.0) * 0.5 + 0.5
            return col, y
        hi = jnp.inf if cfg.hdr else 1.0
        xc = color_mod.sanitize(x[..., :3], 0.0, hi)
        y = color_mod.sanitize(y, 0.0, hi)
        if cfg.hdr:
            # Autoexposure normalization, like the reference's preprocess
            # (training/preprocess.py:39-80: exposure = autoexposure(target),
            # applied to BOTH input and target colors before the transfer).
            # The runtime serves the net behind the same normalization
            # (unet.cpp:134-144 / filter.py/_execute_impl autoexposure), so
            # training on raw radiance — as rounds 2-5a did — puts serving
            # out of distribution and biased HDR output brightness by ~60%.
            # Deviation: the reference computes one exposure per full target
            # image at preprocess time; here it is computed per training
            # crop (the trainer composes crops on device from raw masters).
            # Both center the color distribution at 18% middle gray.
            exp_scale = jax.vmap(color_mod.autoexposure)(y)[:, None, None, None]
            xc = xc * exp_scale
            y = y * exp_scale
        parts = [tf.forward(xc)]
        if cfg.in_channels >= 6:
            parts.append(color_mod.sanitize(x[..., 3:6], 0.0, 1.0))  # albedo
        if cfg.in_channels >= 9:
            # normals: [-1,1] -> [0,1] (input_reorder.ispc storeNormal)
            parts.append(color_mod.sanitize(x[..., 6:9], -1.0, 1.0) * 0.5 + 0.5)
        x = jnp.concatenate(parts, axis=-1)
        y = tf.forward(y)
        return x, y

    return preprocess


def build_train_step(cfg: TrainConfig, optimizer, mesh: Mesh | None):
    loss_fn = get_loss_function(cfg.loss)
    compute_dtype = jnp.bfloat16 if cfg.precision == "mixed" else jnp.float32
    preprocess = make_preprocess(cfg)

    def loss_value(params, x, y):
        x, y = preprocess(x, y)
        pred = unet_apply(params, x.astype(compute_dtype)).astype(jnp.float32)
        return loss_fn(pred, y)

    def train_step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_value)(params, x, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(train_step), None

    batch_sharding = NamedSharding(mesh, P("dp"))
    replicated = NamedSharding(mesh, P())
    step = jax.jit(
        train_step,
        in_shardings=(replicated, replicated, batch_sharding, batch_sharding),
        out_shardings=(replicated, replicated, replicated),
    )
    return step, batch_sharding


def build_eval_step(cfg: TrainConfig, mesh: Mesh | None):
    """Per-example validation losses [B] (no grad). The per-example form lets
    the caller weight out the repeated tiles that pad the final batch."""
    loss_fn = get_loss_function(cfg.loss)
    compute_dtype = jnp.bfloat16 if cfg.precision == "mixed" else jnp.float32
    preprocess = make_preprocess(cfg)

    def eval_step(params, x, y):
        x, y = preprocess(x, y)
        pred = unet_apply(params, x.astype(compute_dtype)).astype(jnp.float32)
        return jax.vmap(lambda p, t: loss_fn(p[None], t[None]))(pred, y)

    if mesh is None:
        return jax.jit(eval_step)
    batch_sharding = NamedSharding(mesh, P("dp"))
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        eval_step,
        in_shardings=(replicated, batch_sharding, batch_sharding),
        out_shardings=batch_sharding,
    )


def validate(cfg: TrainConfig, params, valid_ds: ValidationDataset, eval_fn,
             batch_sharding=None) -> float:
    """Mean loss over the deterministic validation tile grid
    (training/train.py:228-269; the reference's dist.all_reduce of the
    per-rank sums is XLA's job here — eval_fn is sharded over the mesh)."""
    total, count = 0.0, 0
    for x, y, k in valid_ds.batches(cfg.batch_size):
        if x.shape[-1] > cfg.in_channels:
            x = x[..., : cfg.in_channels]
        x, y = jnp.asarray(x), jnp.asarray(y)
        if batch_sharding is not None:
            x = jax.device_put(x, batch_sharding)
            y = jax.device_put(y, batch_sharding)
        losses = np.asarray(eval_fn(params, x, y))
        total += float(losses[:k].sum())
        count += k
    return total / max(count, 1)


def build_epoch_fn(cfg: TrainConfig, optimizer):
    """Device-resident data pipeline: random pose pick, random crop, 8-way
    dihedral augmentation, preprocess, grads and updates for a WHOLE epoch
    run as one jitted program (lax.scan over steps).

    Built for links where every host dispatch costs ~25 ms (the reference's
    DataLoader+DDP feeds each step from host workers, training/train.py:162;
    here the dataset lives in HBM and the host only dispatches epochs).

    The dataset is an ARGUMENT of the jitted function, not a closure: a
    closed-over multi-GB stack gets embedded in the lowered program as a
    constant, and shipping that through the axon remote-compile HTTP
    request breaks the tunnel (broken pipe at epoch 0 — observed on the
    round-3 slot stacks; round 2's smaller stacks squeaked under the
    limit). As arguments they upload once through the normal buffer path.
    """
    loss_fn = get_loss_function(cfg.loss)
    compute_dtype = jnp.bfloat16 if cfg.precision == "mixed" else jnp.float32
    preprocess = make_preprocess(cfg)
    T = cfg.tile_size

    def sample_tile(imgs, p, i, j):
        c = imgs.shape[-1]
        return lax.dynamic_slice(imgs, (p, i, j, 0), (1, T, T, c))[0]

    def dihedral(img, fx, fy, ft):
        img = jnp.where(fx, img[:, ::-1], img)
        img = jnp.where(fy, img[::-1], img)
        return jnp.where(ft, jnp.swapaxes(img, 0, 1), img)

    def make_batch(key, x_imgs, y_imgs):
        P, H, W, _ = x_imgs.shape
        kp, ki, kj, kf = jax.random.split(key, 4)
        B = cfg.batch_size
        p = jax.random.randint(kp, (B,), 0, P)
        i = jax.random.randint(ki, (B,), 0, H - T + 1)
        j = jax.random.randint(kj, (B,), 0, W - T + 1)
        flips = jax.random.bernoulli(kf, 0.5, (B, 3))
        x = jax.vmap(lambda p, i, j: sample_tile(x_imgs, p, i, j))(p, i, j)
        y = jax.vmap(lambda p, i, j: sample_tile(y_imgs, p, i, j))(p, i, j)
        x = jax.vmap(dihedral)(x, flips[:, 0], flips[:, 1], flips[:, 2])
        y = jax.vmap(dihedral)(y, flips[:, 0], flips[:, 1], flips[:, 2])
        return x[..., : cfg.in_channels], y

    def loss_value(params, x, y):
        x, y = preprocess(x, y)
        pred = unet_apply(params, x.astype(compute_dtype)).astype(jnp.float32)
        return loss_fn(pred, y)

    use_ema = cfg.ema > 0.0
    d = jnp.float32(cfg.ema)

    @jax.jit
    def epoch_fn(params, opt_state, ema_params, key, x_imgs, y_imgs):
        def step(carry, k):
            params, opt_state, ema = carry
            x, y = make_batch(k, x_imgs, y_imgs)
            loss, grads = jax.value_and_grad(loss_value)(params, x, y)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if use_ema:
                ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                                   ema, params)
            return (params, opt_state, ema), loss

        keys = jax.random.split(key, cfg.steps_per_epoch)
        (params, opt_state, ema_params), losses = lax.scan(
            step, (params, opt_state, ema_params), keys)
        return params, opt_state, ema_params, jnp.mean(losses)

    return epoch_fn


def train_device(cfg: TrainConfig, x_imgs, y_imgs, log_fn=None):
    """train(), but with the dataset resident in device memory (single chip).

    x_imgs [P,H,W,Cx>=in_channels] / y_imgs [P,H,W,3] are uploaded once;
    every epoch is one device dispatch. Checkpoints/resume/validation match
    train().
    """
    import jax.random as jrandom

    x_imgs = jnp.asarray(x_imgs, jnp.float32)
    y_imgs = jnp.asarray(y_imgs, jnp.float32)
    params = init_unet_params(cfg.in_channels, seed=cfg.seed)

    total_steps = cfg.num_epochs * cfg.steps_per_epoch
    # optax's onecycle divides by the warmup interval width; totals so small
    # that pct_start*total rounds to a zero-width interval yield NaN LR.
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 16),
        peak_value=cfg.max_lr,
        pct_start=cfg.warmup_pct,
    )
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    opt_state = optimizer.init(params)

    start_epoch = 0
    ckpt = latest_checkpoint(cfg.result_dir)
    if ckpt is not None:
        cfg_path = os.path.join(cfg.result_dir, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg.check_compatible(json.load(f))
        params = ckpt["params"]
        opt_state = ckpt["opt_state"]
        start_epoch = ckpt["epoch"]
    elif cfg.init_from and os.path.exists(cfg.init_from):
        # fine-tune warm start: previous round's params, fresh optimizer
        params = load_init_params(cfg.init_from)

    use_ema = cfg.ema > 0.0
    # EMA initializes AT the current weights (a zero init would need a long
    # bias-correction burn-in the short fine-tune regimes don't have);
    # resumed runs restore the saved average when the checkpoint carries one.
    # Explicit None check — `or` on a pytree relies on container truthiness
    # and would misfire for non-dict params containers.
    _ep = (ckpt or {}).get("ema_params")
    ema_params = params if _ep is None else _ep

    epoch_fn = build_epoch_fn(cfg, optimizer)

    valid_dir = cfg.valid_dir or os.path.join(cfg.data_dir, "valid")
    valid_ds, eval_fn = None, None
    if os.path.isdir(valid_dir):
        try:
            valid_ds = ValidationDataset(valid_dir, cfg.tile_size)
            eval_fn = build_eval_step(cfg, None)
        except ValueError:
            valid_ds = None

    log_path = os.path.join(cfg.result_dir, "log.jsonl")
    os.makedirs(cfg.result_dir, exist_ok=True)
    base_key = jrandom.key(cfg.seed)

    step = start_epoch * cfg.steps_per_epoch
    first_loss = None
    # Best-valid state persists in result_dir/best.pkl so resumed runs
    # (crash retries, early-stopped slots re-entered by a campaign loop)
    # never re-export worse-than-best params: a resume that runs zero
    # epochs would otherwise return the final checkpoint.
    best_path = os.path.join(cfg.result_dir, "best.pkl")
    best_valid, best_params, stale = np.inf, None, 0
    if os.path.exists(best_path):
        with open(best_path, "rb") as f:
            _prev = pickle.load(f)
        best_valid = _prev.get("valid_loss", np.inf)
        best_params = _prev.get("params")
    PATIENCE = 8  # valid checks without improvement before early stop
    for epoch in range(start_epoch, cfg.num_epochs):
        t0 = time.time()
        params, opt_state, ema_params, mean_loss = epoch_fn(
            params, opt_state, ema_params, jrandom.fold_in(base_key, epoch),
            x_imgs, y_imgs
        )
        eval_params = ema_params if use_ema else params
        step += cfg.steps_per_epoch
        # Divergence guard: HDR loss surfaces can blow up past the OneCycle
        # peak even with global-norm clipping (params saturate and never
        # recover). Revert to the last good checkpoint and stop this run —
        # the caller/exporter gets usable weights, and a relaunch (with a
        # lower max_lr) resumes from the same checkpoint.
        loss_val = float(mean_loss)
        if first_loss is None and np.isfinite(loss_val):
            first_loss = max(loss_val, 1e-6)
        diverged = not np.isfinite(loss_val) or (
            first_loss is not None and loss_val > 50 * first_loss
        )
        if diverged:
            ckpt = latest_checkpoint(cfg.result_dir)
            msg = {"epoch": epoch + 1, "diverged": True, "loss": loss_val,
                   "reverted_to": ckpt["epoch"] if ckpt else None}
            with open(log_path, "a") as f:
                f.write(json.dumps(msg) + "\n")
            if log_fn:
                log_fn(msg)
            if ckpt is not None:
                params = ckpt["params"]
                _ep = ckpt.get("ema_params")
                ema_params = params if _ep is None else _ep
            break
        rec = {
            "epoch": epoch + 1,
            "step": step,
            "loss": float(mean_loss),
            "lr": float(schedule(step)),
            "images_per_sec": cfg.steps_per_epoch * cfg.batch_size / (time.time() - t0),
        }
        if valid_ds is not None and (
            (epoch + 1) % cfg.valid_epochs == 0 or epoch + 1 == cfg.num_epochs
        ):
            vl = validate(cfg, eval_params, valid_ds, eval_fn)
            rec["valid_loss"] = vl
            # Best-valid selection + early stop: fine-tune runs (warm-started
            # from already-good weights) can overfit monotonically — round-3
            # rt_ldr_alb's valid loss DOUBLED from epoch 120 to 840 while
            # train loss fell. Exporting the final params would regress the
            # shipped weights, so keep the best-valid params (mirrors the
            # reference's keep-best eval loop, training/train.py:228-269)
            # and stop after `patience` checks without improvement.
            if np.isfinite(vl) and vl < best_valid:
                best_valid, best_params, stale = vl, eval_params, 0
                with open(best_path, "wb") as f:
                    pickle.dump({"params": jax.device_get(eval_params),
                                 "valid_loss": vl, "epoch": epoch + 1}, f)
            else:
                stale += 1
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if log_fn:
            log_fn(rec)
        if (epoch + 1) % cfg.save_epochs == 0 or epoch + 1 == cfg.num_epochs:
            save_checkpoint(cfg.result_dir, epoch + 1, step, params, opt_state,
                            cfg, ema_params=ema_params if use_ema else None)
        if stale >= PATIENCE:
            msg = {"epoch": epoch + 1, "early_stop": True, "loss": loss_val,
                   "best_valid": best_valid}
            with open(log_path, "a") as f:
                f.write(json.dumps(msg) + "\n")
            if log_fn:
                log_fn(msg)
            break
    if best_params is not None:
        return best_params
    return ema_params if use_ema else params


def train(cfg: TrainConfig, mesh: Mesh | None = None, log_fn=None):
    """Run training; returns final params. Auto-resumes from result_dir."""
    dataset = TileDataset(cfg.data_dir, cfg.tile_size, seed=cfg.seed)
    params = init_unet_params(cfg.in_channels, seed=cfg.seed)

    total_steps = cfg.num_epochs * cfg.steps_per_epoch
    # optax's onecycle divides by the warmup interval width; totals so small
    # that pct_start*total rounds to a zero-width interval yield NaN LR.
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 16),
        peak_value=cfg.max_lr,
        pct_start=cfg.warmup_pct,
    )
    # Global-norm clipping: occasional SSIM-gradient spikes near the peak LR
    # can otherwise blow up the run irrecoverably.
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    opt_state = optimizer.init(params)

    start_epoch = 0
    ckpt = latest_checkpoint(cfg.result_dir)
    if ckpt is not None:
        cfg_path = os.path.join(cfg.result_dir, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg.check_compatible(json.load(f))
        params = ckpt["params"]
        opt_state = ckpt["opt_state"]
        start_epoch = ckpt["epoch"]
    elif cfg.init_from and os.path.exists(cfg.init_from):
        # fine-tune warm start: previous round's params, fresh optimizer
        params = load_init_params(cfg.init_from)

    step_fn, batch_sharding = build_train_step(cfg, optimizer, mesh)

    valid_dir = cfg.valid_dir or os.path.join(cfg.data_dir, "valid")
    valid_ds, eval_fn = None, None
    if os.path.isdir(valid_dir):
        try:
            valid_ds = ValidationDataset(valid_dir, cfg.tile_size)
            eval_fn = build_eval_step(cfg, mesh)
        except ValueError:
            valid_ds = None

    log_path = os.path.join(cfg.result_dir, "log.jsonl")
    os.makedirs(cfg.result_dir, exist_ok=True)

    step = start_epoch * cfg.steps_per_epoch
    for epoch in range(start_epoch, cfg.num_epochs):
        t0 = time.time()
        losses = []
        for _ in range(cfg.steps_per_epoch):
            x, y = dataset.sample_batch(cfg.batch_size)
            if x.shape[-1] > cfg.in_channels:
                x = x[..., : cfg.in_channels]  # e.g. color-only from color+alb pairs
            x, y = jnp.asarray(x), jnp.asarray(y)
            if batch_sharding is not None:
                x = jax.device_put(x, batch_sharding)
                y = jax.device_put(y, batch_sharding)
            params, opt_state, loss = step_fn(params, opt_state, x, y)
            losses.append(loss)
            step += 1
        mean_loss = float(jnp.mean(jnp.stack(losses)))
        rec = {
            "epoch": epoch + 1,
            "step": step,
            "loss": mean_loss,
            "lr": float(schedule(step)),
            "images_per_sec": cfg.steps_per_epoch * cfg.batch_size / (time.time() - t0),
        }
        if valid_ds is not None and (
            (epoch + 1) % cfg.valid_epochs == 0 or epoch + 1 == cfg.num_epochs
        ):
            rec["valid_loss"] = validate(cfg, params, valid_ds, eval_fn, batch_sharding)
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if log_fn:
            log_fn(rec)
        if (epoch + 1) % cfg.save_epochs == 0 or epoch + 1 == cfg.num_epochs:
            save_checkpoint(cfg.result_dir, epoch + 1, step, params, opt_state, cfg)
    return params
