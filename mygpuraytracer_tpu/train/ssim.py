"""SSIM / MS-SSIM in JAX (NHWC).

JAX reimplementation of the metrics used by the reference trainer
(training/ssim.py, standard Wang et al. 2004 SSIM and Wang et al. 2003
MS-SSIM with the usual 11x11 sigma-1.5 Gaussian window and power weights).
Depthwise convolutions keep the window application on the MXU.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    xs = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(xs**2) / (2 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _filter2d(x, window):
    """Depthwise 2D filter, NHWC; 'valid' padding like the torch impl.

    Precision HIGHEST is load-bearing: TPU convs on f32 inputs compute in
    bf16 by default, and the variance estimators below are catastrophic
    cancellations (E[x^2] - mu^2) — bf16's ~8e-3 relative error dwarfs
    c2 = 9e-4 on low-contrast tiles, driving sigma (and even the cs
    denominator) negative. Observed on hardware as valid_loss = -0.14
    (MS-SSIM "1.17") on the round-3 800^2 validation tiles."""
    c = x.shape[-1]
    w = jnp.broadcast_to(window[:, :, None, None], (*window.shape, 1, c))
    w = jnp.transpose(w, (0, 1, 2, 3))  # HWIO with I=1 (depthwise)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


def _ssim_parts(a, b, window, c1=0.01**2, c2=0.03**2):
    mu_a = _filter2d(a, window)
    mu_b = _filter2d(b, window)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    # The Gaussian-window empirical covariance matrix is PSD in exact
    # arithmetic; float error can still leave sigma slightly negative or
    # sigma_ab past Cauchy-Schwarz on near-constant windows, which lets
    # cs exceed 1 (and the training loss go negative). Clamp to the cone.
    sig_a = jnp.maximum(_filter2d(a * a, window) - mu_aa, 0.0)
    sig_b = jnp.maximum(_filter2d(b * b, window) - mu_bb, 0.0)
    sig_ab = _filter2d(a * b, window) - mu_ab
    bound = jnp.sqrt(sig_a * sig_b + 1e-20)
    sig_ab = jnp.clip(sig_ab, -bound, bound)
    cs = (2 * sig_ab + c2) / (sig_a + sig_b + c2)
    ssim = ((2 * mu_ab + c1) / (mu_aa + mu_bb + c1)) * cs
    return ssim, cs


def ssim(a: jnp.ndarray, b: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over NHWC batches (values assumed in [0,1])."""
    window = _gaussian_window(window_size)
    s, _ = _ssim_parts(a, b, window)
    return jnp.mean(s)


def _downsample2(x):
    return lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def ms_ssim(
    a: jnp.ndarray, b: jnp.ndarray, window_size: int = 11, product: bool = True
) -> jnp.ndarray:
    """Multi-scale SSIM with the standard 5-scale weights.

    The scale count adapts (statically) to the input size: each scale needs
    H,W >= window after the preceding 2x downsamples; weights of the used
    scales are renormalized to sum to 1 (small-tile training still works)."""
    h, w = int(a.shape[1]), int(a.shape[2])
    n_scales = 0
    hh, ww = h, w
    while n_scales < len(_MSSSIM_WEIGHTS) and hh >= window_size and ww >= window_size:
        n_scales += 1
        hh //= 2
        ww //= 2
    if n_scales == 0:
        raise ValueError(f"input {h}x{w} too small for SSIM window {window_size}")
    weights = np.asarray(_MSSSIM_WEIGHTS[:n_scales])
    weights = weights / weights.sum()

    window = _gaussian_window(window_size)
    vals = []
    for i in range(n_scales):
        s, cs = _ssim_parts(a, b, window)
        vals.append(jnp.mean(s) if i == n_scales - 1 else jnp.mean(cs))
        if i != n_scales - 1:
            a = _downsample2(a)
            b = _downsample2(b)
    if product:
        total = jnp.float32(1.0)
        for wgt, v in zip(weights, vals):
            total = total * jnp.power(jnp.maximum(v, 1e-6), wgt)
        return total
    # Weighted-sum form: same optimum, bounded gradients (the product form's
    # v^w explodes as v -> 0, which destabilizes training on small tiles).
    total = jnp.float32(0.0)
    for wgt, v in zip(weights, vals):
        total = total + wgt * v
    return total
