"""Learning-rate range test (training/find_lr.py equivalent).

Sweeps the LR geometrically from min_lr to max_lr over num_steps while
training, recording smoothed loss per step; the usable LR band is where the
smoothed loss still decreases.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..denoise.unet import init_unet_params, unet_apply
from .dataset import TileDataset
from .losses import get_loss_function


def find_lr(
    data_dir: str,
    in_channels: int = 6,
    loss: str = "l1_msssim",
    min_lr: float = 1e-7,
    max_lr: float = 0.1,
    num_steps: int = 100,
    batch_size: int = 4,
    tile_size: int = 128,
    smoothing: float = 0.9,
    seed: int = 0,
):
    """Returns (lrs, smoothed_losses) arrays of length <= num_steps
    (stops early when the loss explodes, like the reference)."""
    dataset = TileDataset(data_dir, tile_size, seed=seed)
    params = init_unet_params(in_channels, seed=seed)
    loss_fn = get_loss_function(loss)

    lrs = np.geomspace(min_lr, max_lr, num_steps)
    sgd = optax.sgd(1.0)  # lr applied manually per step
    opt_state = sgd.init(params)

    @jax.jit
    def step(params, opt_state, x, y, lr):
        def value(p):
            return loss_fn(unet_apply(p, x), y)

        loss_v, grads = jax.value_and_grad(value)(params)
        grads = jax.tree.map(lambda g: g * lr, grads)
        updates, opt_state = sgd.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_v

    out_lrs, out_losses = [], []
    avg = 0.0
    best = float("inf")
    for i, lr in enumerate(lrs):
        x, y = dataset.sample_batch(batch_size)
        params, opt_state, loss_v = step(
            params, opt_state, jnp.asarray(x), jnp.asarray(y), jnp.float32(lr)
        )
        loss_v = float(loss_v)
        if not np.isfinite(loss_v):
            break
        avg = smoothing * avg + (1 - smoothing) * loss_v
        debiased = avg / (1 - smoothing ** (i + 1))
        out_lrs.append(float(lr))
        out_losses.append(debiased)
        best = min(best, debiased)
        if debiased > 4.0 * best:  # diverged
            break
    return np.asarray(out_lrs), np.asarray(out_losses)
