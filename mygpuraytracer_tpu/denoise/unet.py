"""The OIDN U-Net as a pure JAX function (MXU convolutions).

Topology is exactly the reference inference/training network
(training/model.py:48-133, core/unet.cpp:356-590): 3x3 convs stride 1 pad 1
with fused ReLU, 2x2 max pools, x2 nearest upsamples, skip concats including
the input image, channels 32/48/64/80/96 -> 112/96/64/64/32 -> out.

Design notes (TPU):
- NHWC activations + HWIO weights: channels ride the lane dimension, convs
  lower straight onto the MXU via lax.conv_general_dilated.
- The reference's blocked-CHW layouts, weight-padding-to-blocksize, hand-packed
  scratch arena and per-node reorders (core/network.cpp:98-275) all disappear:
  XLA's layout assignment and buffer allocator own those jobs.
- bfloat16 compute with float32 accumulation is the default on TPU; pass
  dtype=jnp.float32 for strict-parity runs.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

UNET_ALIGNMENT = 16  # images padded to multiples of this (model.py:85, unet.h:22)
UNET_RECEPTIVE_FIELD = 174  # unet.h:21 (defines the tiling overlap)

# (name, in_ch_fn, out_ch) in execution order; in channels depend on input count.
_EC1, _EC2, _EC3, _EC4, _EC5 = 32, 48, 64, 80, 96
_DC4, _DC3, _DC2, _DC1A, _DC1B = 112, 96, 64, 64, 32


def conv_specs(in_channels: int, out_channels: int = 3):
    """[(name, cin, cout)] for every conv in the network."""
    ic = in_channels
    return [
        ("enc_conv0", ic, _EC1),
        ("enc_conv1", _EC1, _EC1),
        ("enc_conv2", _EC1, _EC2),
        ("enc_conv3", _EC2, _EC3),
        ("enc_conv4", _EC3, _EC4),
        ("enc_conv5a", _EC4, _EC5),
        ("enc_conv5b", _EC5, _EC5),
        ("dec_conv4a", _EC5 + _EC3, _DC4),
        ("dec_conv4b", _DC4, _DC4),
        ("dec_conv3a", _DC4 + _EC2, _DC3),
        ("dec_conv3b", _DC3, _DC3),
        ("dec_conv2a", _DC3 + _EC1, _DC2),
        ("dec_conv2b", _DC2, _DC2),
        ("dec_conv1a", _DC2 + ic, _DC1A),
        ("dec_conv1b", _DC1A, _DC1B),
        ("dec_conv0", _DC1B, out_channels),
    ]


def init_unet_params(in_channels: int, out_channels: int = 3, seed: int = 0, dtype=jnp.float32):
    """He-initialized parameters {name: {'w': HWIO, 'b': [O]}} — used for
    training and for smoke-testing the graph when real weights are absent."""
    key = jax.random.key(seed)
    params = {}
    for name, cin, cout in conv_specs(in_channels, out_channels):
        key, sub = jax.random.split(key)
        fan_in = 3 * 3 * cin
        w = jax.random.normal(sub, (3, 3, cin, cout), dtype) * math.sqrt(2.0 / fan_in)
        params[name] = {"w": w, "b": jnp.zeros((cout,), dtype)}
    return params


def params_from_tza(tensors: dict, dtype=jnp.float32):
    """Convert {name: (array, layout)} from a TZA archive to unet params.

    oihw conv weights -> HWIO; 'x' biases pass through. (The reference instead
    pads O/I to the ISA block size and reorders to the oneDNN JIT layout,
    core/network.cpp:216-275 — not needed on TPU.)
    """
    params = {}
    for key, (arr, layout) in tensors.items():
        if key.endswith(".weight"):
            if layout != "oihw":
                raise ValueError(f"unexpected weight layout {layout} for {key}")
            name = key[: -len(".weight")]
            w = np.transpose(arr, (2, 3, 1, 0))  # oihw -> hwio
            params.setdefault(name, {})["w"] = jnp.asarray(w, dtype)
        elif key.endswith(".bias"):
            name = key[: -len(".bias")]
            params.setdefault(name, {})["b"] = jnp.asarray(arr, dtype)
    return params


def params_in_channels(params: dict) -> int:
    return int(params["enc_conv0"]["w"].shape[2])


_DIMSPEC = lax.ConvDimensionNumbers(
    lhs_spec=(0, 3, 1, 2), rhs_spec=(3, 2, 0, 1), out_spec=(0, 3, 1, 2)
)


def _conv_relu(x, p, relu: bool = True):
    # Same-dtype conv: the TPU conv unit accumulates bf16 inputs in f32
    # internally, and a uniform dtype keeps the VJP transposable.
    w = p["w"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + p["b"].astype(x.dtype)
    if relu:
        y = jnp.maximum(y, jnp.zeros((), x.dtype))
    return y


def _pool(x):
    """2x2 max pool stride 2 (model.py:33-34, core/pool.h).

    init must be -inf (not finfo.min) so XLA pattern-matches the
    differentiable reduce-window-max."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _upsample(x):
    """x2 nearest-neighbor (model.py:37-38, core/upsample.ispc)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def unet_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Forward pass. x: [N, H, W, C] with H, W multiples of 16.

    Concat order matches the reference: (upsampled, skip) — network.cpp
    implements this by memory placement (unet.cpp:530-566); here it's an
    actual concatenate that XLA fuses away.
    """
    assert x.shape[1] % UNET_ALIGNMENT == 0 and x.shape[2] % UNET_ALIGNMENT == 0, (
        f"input H/W must be multiples of {UNET_ALIGNMENT}, got {x.shape}"
    )
    inp = x
    x = _conv_relu(x, params["enc_conv0"])
    x = _conv_relu(x, params["enc_conv1"])
    x = pool1 = _pool(x)
    x = _conv_relu(x, params["enc_conv2"])
    x = pool2 = _pool(x)
    x = _conv_relu(x, params["enc_conv3"])
    x = pool3 = _pool(x)
    x = _conv_relu(x, params["enc_conv4"])
    x = _pool(x)
    x = _conv_relu(x, params["enc_conv5a"])
    x = _conv_relu(x, params["enc_conv5b"])

    x = _upsample(x)
    x = jnp.concatenate([x, pool3], axis=-1)
    x = _conv_relu(x, params["dec_conv4a"])
    x = _conv_relu(x, params["dec_conv4b"])

    x = _upsample(x)
    x = jnp.concatenate([x, pool2], axis=-1)
    x = _conv_relu(x, params["dec_conv3a"])
    x = _conv_relu(x, params["dec_conv3b"])

    x = _upsample(x)
    x = jnp.concatenate([x, pool1], axis=-1)
    x = _conv_relu(x, params["dec_conv2a"])
    x = _conv_relu(x, params["dec_conv2b"])

    x = _upsample(x)
    x = jnp.concatenate([x, inp], axis=-1)
    x = _conv_relu(x, params["dec_conv1a"])
    x = _conv_relu(x, params["dec_conv1b"])

    x = _conv_relu(x, params["dec_conv0"], relu=False)
    return x


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
