"""Direction sampling and reflection/refraction math.

Vectorized equivalents of apps/src/interactions.h:12-86 (cosine-weighted
hemisphere with the Peter-Kutz frame trick, stratified-jitter variant) and
pathtrace.cu:225-239 (concentric disk for thin-lens DoF), plus glm-compatible
reflect/refract.
All functions operate on [..., 3] arrays and are jit/vmap friendly.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

SQRT_OF_ONE_THIRD = math.sqrt(1.0 / 3.0)  # utilities.h:14
TWO_PI = 2.0 * math.pi


def _hemisphere_frame(normal: jnp.ndarray):
    """Two tangent vectors perpendicular to ``normal`` via the Peter-Kutz
    not-the-normal axis pick (interactions.h:26-39)."""
    ax = jnp.abs(normal[..., 0:1]) < SQRT_OF_ONE_THIRD
    ay = jnp.abs(normal[..., 1:2]) < SQRT_OF_ONE_THIRD
    ex = jnp.array([1.0, 0.0, 0.0], normal.dtype)
    ey = jnp.array([0.0, 1.0, 0.0], normal.dtype)
    ez = jnp.array([0.0, 0.0, 1.0], normal.dtype)
    not_normal = jnp.where(ax, ex, jnp.where(ay, ey, ez))
    p1 = jnp.cross(normal, not_normal)
    p1 = p1 / jnp.linalg.norm(p1, axis=-1, keepdims=True)
    p2 = jnp.cross(normal, p1)
    p2 = p2 / jnp.linalg.norm(p2, axis=-1, keepdims=True)
    return p1, p2


def _hemisphere_from_polar(normal, up, around):
    over = jnp.sqrt(jnp.maximum(0.0, 1.0 - up * up))
    p1, p2 = _hemisphere_frame(normal)
    return (
        up[..., None] * normal
        + (jnp.cos(around) * over)[..., None] * p1
        + (jnp.sin(around) * over)[..., None] * p2
    )


def cosine_sample_hemisphere(normal: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray):
    """Cosine-weighted hemisphere direction (interactions.h:12-44).

    up = sqrt(u1) = cos(theta); around = u2 * 2pi.
    """
    return _hemisphere_from_polar(normal, jnp.sqrt(u1), u2 * TWO_PI)


def jittered_sample_hemisphere(
    normal: jnp.ndarray, u1, u2, iteration, max_iterations: int
):
    """Stratified-jitter hemisphere variant (interactions.h:47-86).

    Strata are a sqrt(max_iterations) grid indexed by the iteration number.
    """
    sqrt_val = int(math.sqrt(float(max_iterations)) + 0.5)
    inv = 1.0 / float(sqrt_val)
    x = jnp.mod(iteration, sqrt_val).astype(jnp.float32)
    y = jnp.floor(iteration.astype(jnp.float32) / sqrt_val)
    xp = jnp.clip((x + u1) * inv, 0.0, 1.0)
    yp = jnp.clip((y + u2) * inv, 0.0, 1.0)
    return _hemisphere_from_polar(normal, jnp.sqrt(yp), xp * TWO_PI)


def concentric_sample_disk(u: jnp.ndarray) -> jnp.ndarray:
    """[...,2] uniform -> concentric disk mapping (pathtrace.cu:225-239)."""
    offset = 2.0 * u - 1.0
    ox, oy = offset[..., 0], offset[..., 1]
    use_x = jnp.abs(ox) > jnp.abs(oy)
    # Guard the 0/0 at the origin; reference early-outs to (0,0).
    safe_ox = jnp.where(ox == 0.0, 1.0, ox)
    safe_oy = jnp.where(oy == 0.0, 1.0, oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(
        use_x,
        0.785398 * (oy / safe_ox),
        1.570796 - 0.785398 * (ox / safe_oy),
    )
    disk = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    degenerate = (ox == 0.0) & (oy == 0.0)
    return jnp.where(degenerate[..., None], 0.0, disk)


def reflect(incident: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """glm::reflect: I - 2*dot(N,I)*N."""
    return incident - 2.0 * jnp.sum(incident * normal, axis=-1, keepdims=True) * normal


def refract(incident: jnp.ndarray, normal: jnp.ndarray, eta: jnp.ndarray) -> jnp.ndarray:
    """glm::refract. Returns the zero vector on total internal reflection."""
    cosi = jnp.sum(normal * incident, axis=-1, keepdims=True)
    eta = eta[..., None] if eta.ndim == incident.ndim - 1 else eta
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    refr = eta * incident - (eta * cosi + jnp.sqrt(jnp.maximum(k, 0.0))) * normal
    return jnp.where(k < 0.0, 0.0, refr)


def schlick_reflect_coeff(cos_theta: jnp.ndarray, ior1, ior2) -> jnp.ndarray:
    """Schlick approximation as written in interactions.h:152-153."""
    r0 = ((ior1 - ior2) / (ior1 + ior2)) ** 2
    return r0 + (1.0 - r0) * jnp.power(1.0 - cos_theta, 5.0)
