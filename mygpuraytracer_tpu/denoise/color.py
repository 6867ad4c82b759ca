"""Transfer functions, sanitization, and autoexposure for the denoiser.

JAX mirrors of core/color.ispc (Linear/sRGB/PU/Log, each forward+inverse with
HDR normalization) and the autoexposure estimator (core/color.cpp:33-84 /
training/color.py:138-173: 16x downsample, log2-mean of luminance, key 0.18).
Constants are the published PU2-fit values [Aydin et al. 2008].
"""

from __future__ import annotations

import math

import jax.numpy as jnp

HDR_Y_MAX = 65504.0  # maximum HDR value (half max)

# sRGB constants (color.ispc / training/color.py)
SRGB_A = 12.92
SRGB_B = 1.055
SRGB_C = 1.0 / 2.4
SRGB_D = -0.055
SRGB_Y0 = 0.0031308
SRGB_X0 = 0.04045

# PU2-curve fit constants [Aydin et al., 2008]
PU_A = 1.41283765e03
PU_B = 1.64593172e00
PU_C = 4.31384981e-01
PU_D = -2.94139609e-03
PU_E = 1.92653254e-01
PU_F = 6.26026094e-03
PU_G = 9.98620152e-01
PU_Y0 = 1.57945760e-06
PU_Y1 = 3.22087631e-02
PU_X0 = 2.23151711e-03
PU_X1 = 3.70974749e-01


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    return 0.212671 * rgb[..., 0] + 0.715160 * rgb[..., 1] + 0.072169 * rgb[..., 2]


def nan_to_zero(x: jnp.ndarray) -> jnp.ndarray:
    """NaN -> 0 sanitize (color.isph nan_to_zero); Inf survives for clamping."""
    return jnp.where(jnp.isnan(x), 0.0, x)


def sanitize(x, lo, hi):
    return jnp.clip(nan_to_zero(x), lo, hi)


# -- transfer functions -------------------------------------------------------


def _srgb_forward(y):
    return jnp.where(y <= SRGB_Y0, SRGB_A * y, SRGB_B * jnp.power(jnp.maximum(y, 1e-38), SRGB_C) + SRGB_D)


def _srgb_inverse(x):
    return jnp.where(
        x <= SRGB_X0, x / SRGB_A, jnp.power(jnp.maximum((x - SRGB_D) / SRGB_B, 1e-38), 2.4)
    )


def _pu_forward_raw(y):
    y_safe = jnp.maximum(y, 1e-38)
    return jnp.where(
        y <= PU_Y0,
        PU_A * y,
        jnp.where(
            y <= PU_Y1,
            PU_B * jnp.power(y_safe, PU_C) + PU_D,
            PU_E * jnp.log(y + PU_F) + PU_G,
        ),
    )


def _pu_inverse_raw(x):
    return jnp.where(
        x <= PU_X0,
        x / PU_A,
        jnp.where(
            x <= PU_X1,
            jnp.power(jnp.maximum((x - PU_D) / PU_B, 1e-38), 1.0 / PU_C),
            jnp.exp((x - PU_G) / PU_E) - PU_F,
        ),
    )


_PU_NORM = 1.0 / (PU_E * math.log(HDR_Y_MAX + PU_F) + PU_G)
_LOG_NORM = 1.0 / math.log(HDR_Y_MAX + 1.0)


class TransferFunction:
    """Forward/inverse transfer with input/output scaling (core/color.h).

    input_scale is the autoexposure (or user inputScale); output_scale is its
    reciprocal, applied after the inverse transform.
    """

    kind = "linear"

    def __init__(self, input_scale: float = 1.0):
        self.input_scale = input_scale

    @property
    def output_scale(self) -> float:
        return 1.0 / self.input_scale

    def forward(self, y):
        return y

    def inverse(self, x):
        return x


class SRGBTransfer(TransferFunction):
    kind = "srgb"

    def forward(self, y):
        return _srgb_forward(y)

    def inverse(self, x):
        return _srgb_inverse(x)


class PUTransfer(TransferFunction):
    kind = "pu"

    def forward(self, y):
        return _pu_forward_raw(y) * _PU_NORM

    def inverse(self, x):
        return _pu_inverse_raw(x / _PU_NORM)


class LogTransfer(TransferFunction):
    kind = "log"

    def forward(self, y):
        return jnp.log(y + 1.0) * _LOG_NORM

    def inverse(self, x):
        return jnp.exp(x / _LOG_NORM) - 1.0


def make_transfer(kind: str, input_scale: float = 1.0) -> TransferFunction:
    cls = {
        "linear": TransferFunction,
        "srgb": SRGBTransfer,
        "pu": PUTransfer,
        "log": LogTransfer,
    }[kind]
    return cls(input_scale)


# -- autoexposure -------------------------------------------------------------


def autoexposure(image: jnp.ndarray, key: float = 0.18, k: int = 16, eps: float = 1e-8):
    """input_scale = key / 2^mean(log2 L) over a KxK-downsampled luminance map.

    Mirrors core/color.cpp:33-84 / training/color.py:138-173. ``image`` is
    HxWx3; returns a python float (host sync) or traced scalar if jitted.
    """
    h, w = image.shape[0], image.shape[1]
    L = luminance(sanitize(image, 0.0, jnp.inf))
    hk = max((h + k // 2) // k, 1)
    wk = max((w + k // 2) // k, 1)
    # Downsample by averaging over equal bins (pad to a multiple).
    ph, pw = hk * ((h + hk - 1) // hk), wk * ((w + wk - 1) // wk)
    Lp = jnp.zeros((ph, pw), L.dtype).at[:h, :w].set(L)
    cnt = jnp.zeros((ph, pw), L.dtype).at[:h, :w].set(1.0)
    bh, bw = ph // hk, pw // wk
    Ld = Lp.reshape(hk, bh, wk, bw).sum(axis=(1, 3))
    Cd = cnt.reshape(hk, bh, wk, bw).sum(axis=(1, 3))
    Ld = Ld / jnp.maximum(Cd, 1.0)

    mask = Ld > eps
    num = jnp.sum(jnp.where(mask, jnp.log2(jnp.maximum(Ld, eps)), 0.0))
    den = jnp.sum(mask)
    mean_log = num / jnp.maximum(den, 1)
    scale = key / jnp.exp2(mean_log)
    return jnp.where(den == 0, 1.0, scale)
