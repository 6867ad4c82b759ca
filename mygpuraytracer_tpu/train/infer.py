"""Inference + image metrics for trained denoisers.

Equivalent of training/infer.py (the Infer class: transfer -> pad to 16 ->
model -> unpad -> clamp -> inverse, infer.py:19-99) and training/image.py
metrics (PSNR/MSE/SSIM, image.py:41-57).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..denoise import color as color_mod
from ..denoise.unet import UNET_ALIGNMENT, round_up, unet_apply
from .ssim import ssim as ssim_fn


class Infer:
    """Apply a trained U-Net to full images (HWC numpy in/out).

    Channel conventions mirror build_train_step's preprocess (and the
    runtime's input packing, input_reorder.ispc): [:3] color (transfer
    applied), [3:6] albedo (clamped to [0,1]), [6:9] normal (snorm-shifted
    [-1,1] -> [0,1]). ``snorm`` switches the whole net to the
    signed-normalized convention (the rt_nrm prefilter).

    ``aux_infers``: optional {'albedo': Infer, 'normal': Infer} prefilter
    chain (reference training/infer.py:46-52,71-78) — the aux channels are
    denoised by their own nets (rt_alb / rt_nrm) before the main net runs.
    The cleanAux (calb/cnrm) weights expect exactly this.
    """

    def __init__(
        self,
        params: dict,
        transfer: str = "srgb",
        hdr: bool = False,
        snorm: bool = False,
        aux_infers: dict | None = None,
    ):
        self.params = params
        self.transfer = color_mod.make_transfer(transfer)
        self.hdr = hdr
        self.snorm = snorm
        self.aux_infers = aux_infers or {}
        self._jitted = {}

    def __call__(self, image: np.ndarray) -> np.ndarray:
        h, w, c = image.shape

        if self.aux_infers and c >= 6:
            image = np.array(image, np.float32, copy=True)
            if "albedo" in self.aux_infers:
                image[..., 3:6] = self.aux_infers["albedo"](image[..., 3:6])
            if "normal" in self.aux_infers and c >= 9:
                image[..., 6:9] = self.aux_infers["normal"](image[..., 6:9])

        hp, wp = round_up(h, UNET_ALIGNMENT), round_up(w, UNET_ALIGNMENT)
        x = jnp.zeros((hp, wp, c), jnp.float32).at[:h, :w].set(jnp.asarray(image))

        if self.snorm:
            x = color_mod.sanitize(x[..., :3], -1.0, 1.0) * 0.5 + 0.5
        else:
            color = color_mod.sanitize(x[..., :3], 0.0, jnp.inf if self.hdr else 1.0)
            parts = [self.transfer.forward(color * self.transfer.input_scale)]
            if c >= 6:
                parts.append(color_mod.sanitize(x[..., 3:6], 0.0, 1.0))
            if c >= 9:
                parts.append(color_mod.sanitize(x[..., 6:9], -1.0, 1.0) * 0.5 + 0.5)
            x = jnp.concatenate(parts, axis=-1)

        fn = self._jitted.get((hp, wp, c))
        if fn is None:
            fn = jax.jit(lambda p, a: unet_apply(p, a[None])[0])
            self._jitted[(hp, wp, c)] = fn
        y = fn(self.params, x)

        if self.snorm:
            y = jnp.clip(y, 0.0, 1.0) * 2.0 - 1.0
        else:
            y = color_mod.sanitize(y, 0.0, jnp.inf)
            y = self.transfer.inverse(y) * self.transfer.output_scale
            if not self.hdr:
                y = jnp.minimum(y, 1.0)
        return np.asarray(y[:h, :w])


def mse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(mse(a, b)))


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    m = mse(a, b)
    if m == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / m))


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    a4 = jnp.asarray(a, jnp.float32)[None]
    b4 = jnp.asarray(b, jnp.float32)[None]
    return float(ssim_fn(a4, b4))


METRICS = {"mse": mse, "rmse": rmse, "psnr": psnr, "ssim": ssim}
