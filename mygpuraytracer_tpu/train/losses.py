"""Training losses.

JAX equivalents of training/loss.py: L1, L2, MAPE, SMAPE, SSIM, MS-SSIM,
the default mix L1 + MS-SSIM weighted 0.16/0.84 [Zhao et al., "Loss functions
for image restoration..."], and L1 + gradient (Sobel-free forward-difference
gradient like the reference's HDRLoss family).
All take (pred, target) as NHWC arrays and return a scalar.
"""

from __future__ import annotations

import jax.numpy as jnp

from .ssim import ms_ssim, ssim


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def mape_loss(pred, target, eps: float = 1e-2):
    """Mean absolute percentage error (relative L1)."""
    return jnp.mean(jnp.abs(pred - target) / (jnp.abs(target) + eps))


def smape_loss(pred, target, eps: float = 1e-2):
    """Symmetric MAPE."""
    return jnp.mean(
        2.0 * jnp.abs(pred - target) / (jnp.abs(pred) + jnp.abs(target) + eps)
    )


def ssim_loss(pred, target):
    return 1.0 - ssim(pred, target)


def msssim_loss(pred, target):
    # sum form: bounded gradients (see train/ssim.py); the product form is
    # kept for the ms_ssim *metric*.
    return 1.0 - ms_ssim(pred, target, product=False)


def l1_msssim_loss(pred, target, alpha: float = 0.16):
    """Default loss: 0.16*L1 + 0.84*(1-MS-SSIM) (loss.py:28-29)."""
    return alpha * l1_loss(pred, target) + (1.0 - alpha) * msssim_loss(pred, target)


def _grad(x):
    dx = x[:, :, 1:, :] - x[:, :, :-1, :]
    dy = x[:, 1:, :, :] - x[:, :-1, :, :]
    return dx, dy


def l1_grad_loss(pred, target, alpha: float = 0.5):
    """L1 + image-gradient L1 (training/loss.py gradient variant)."""
    pdx, pdy = _grad(pred)
    tdx, tdy = _grad(target)
    g = 0.5 * (jnp.mean(jnp.abs(pdx - tdx)) + jnp.mean(jnp.abs(pdy - tdy)))
    return alpha * l1_loss(pred, target) + (1 - alpha) * g


_LOSSES = {
    "l1": l1_loss,
    "l2": l2_loss,
    "mape": mape_loss,
    "smape": smape_loss,
    "ssim": ssim_loss,
    "msssim": msssim_loss,
    "l1_msssim": l1_msssim_loss,
    "l1_grad": l1_grad_loss,
}


def get_loss_function(name: str = "l1_msssim"):
    """training/loss.py:13-33 equivalent."""
    try:
        return _LOSSES[name]
    except KeyError:
        raise ValueError(f"invalid loss function '{name}'") from None
