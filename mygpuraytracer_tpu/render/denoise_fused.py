"""On-device render->denoise fusion.

The reference's #1 architectural bottleneck: every frame it copies the
accumulated image GPU->host (pathtrace.cu:663-669), denoises on the CPU
(main.cpp:167-218), and uploads the result back (pathtrace.cu:673-685).
Here normalization, input packing (sRGB transfer + sanitize), the U-Net, and
output unpacking run in ONE device program straight off the accumulator —
AOVs never leave HBM.

Semantics = the app's CPUdenoise: RT filter, LDR color (beauty/iteration) +
albedo auxiliary (main.cpp:193-203 -> rt_ldr_alb weights).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..denoise import color as color_mod
from ..denoise import weights as weights_mod
from ..denoise.unet import UNET_ALIGNMENT, round_up, unet_apply
from ..ops.vec3 import Vec3


@functools.partial(jax.jit, static_argnames=("resolution", "hdr"))
def denoise_accumulator(
    image: Vec3, albedo: Vec3, iteration, params, resolution: tuple[int, int],
    normal: Vec3 | None = None, hdr: bool = False,
):
    """Normalize + pack + U-Net + unpack, fully on device.

    image/albedo (and optionally normal): flat [N] Vec3 accumulators;
    iteration: i32 scalar. With ``normal`` the 9-channel *_alb_nrm packing
    is used (core/unet.cpp:693-763 feature table), else the 6-channel
    *_alb one. Default is the LDR pipeline (sRGB transfer, clamped [0,1]
    output — the app's CPUdenoise semantics, main.cpp:193-203).

    ``hdr=True`` switches to the HDR pipeline the rt_hdr_* weights are
    trained for: autoexposure input scale from the normalized color
    (core/color.cpp:33-84, applied per unet.cpp:134-144), PU transfer,
    unclamped radiance out — feed rt_hdr_alb/rt_hdr_alb_nrm params.
    """
    w, h = resolution
    hp, wp = round_up(h, UNET_ALIGNMENT), round_up(w, UNET_ALIGNMENT)
    inv_iter = 1.0 / jnp.maximum(iteration.astype(jnp.float32), 1.0)

    def plane(v: Vec3, scale):
        img = jnp.stack(
            [v.x.reshape(h, w), v.y.reshape(h, w), v.z.reshape(h, w)], axis=-1
        ) * scale
        return jnp.zeros((hp, wp, 3), jnp.float32).at[:h, :w].set(img)

    color = plane(image, inv_iter)
    alb = plane(albedo, 1.0)

    # input_reorder.ispc semantics: color scaled + sanitized + transferred;
    # albedo clamped only; normal snorm [-1,1] -> [0,1].
    if hdr:
        # Autoexposure on the real pixels only (the alignment padding's
        # zeros would bias the log-mean down).
        in_scale = color_mod.autoexposure(color[:h, :w])
        tf = color_mod.PUTransfer()
        color = tf.forward(color_mod.sanitize(color * in_scale, 0.0, jnp.inf))
    else:
        tf = color_mod.SRGBTransfer()
        color = tf.forward(color_mod.sanitize(color, 0.0, 1.0))
    alb = color_mod.sanitize(alb, 0.0, 1.0)
    chans = [color, alb]
    if normal is not None:
        # like albedo, the normal AOV is captured at iteration 1 (renderer
        # _first_select), not accumulated — no 1/iter normalization;
        # sanitize+shift matches the runtime filter (filter.py _pack_input)
        nrm = color_mod.sanitize(plane(normal, 1.0), -1.0, 1.0)
        chans.append(nrm * 0.5 + 0.5)

    # bf16 through the MXU on TPU; f32 where bf16 convs are emulated (CPU).
    net_dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    x = jnp.concatenate(chans, axis=-1).astype(net_dtype)
    params16 = jax.tree.map(lambda a: a.astype(net_dtype), params)
    y = unet_apply(params16, x[None])[0].astype(jnp.float32)

    # output_reorder.ispc: sanitize, inverse transfer, then LDR clamp or
    # HDR un-exposure (output_scale = 1/input_scale).
    y = color_mod.sanitize(y, 0.0, jnp.inf)
    y = tf.inverse(y)
    y = y / in_scale if hdr else jnp.minimum(y, 1.0)
    return y[:h, :w]


def load_denoiser_params(name: str = "rt_ldr_alb"):
    """Returns (params, using_random_weights)."""
    return weights_mod.load_default_params(name)
