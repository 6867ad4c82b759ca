"""Primary ray generation (SoA).

Vectorized equivalent of generateRayFromCamera (apps/src/pathtrace.cu:248-297):
one lane per pixel, stochastic AA jitter of +-0.5 px, optional thin-lens depth
of field via the concentric disk mapping. Lane index == pixelIndex (row-major
x + y*width), so no pixelIndex indirection exists until a wavefront sort
reorders lanes.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import RenderOptions
from ..ops import vec3 as v3
from ..ops.vec3 import Vec3
from ..scene.device_scene import CameraParams


def _concentric_disk(ux, uy):
    """Concentric disk mapping (pathtrace.cu:225-239), SoA."""
    ox = 2.0 * ux - 1.0
    oy = 2.0 * uy - 1.0
    use_x = jnp.abs(ox) > jnp.abs(oy)
    safe_ox = jnp.where(ox == 0.0, 1.0, ox)
    safe_oy = jnp.where(oy == 0.0, 1.0, oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(use_x, 0.785398 * (oy / safe_ox), 1.570796 - 0.785398 * (ox / safe_oy))
    degen = (ox == 0.0) & (oy == 0.0)
    px = jnp.where(degen, 0.0, r * jnp.cos(theta))
    py = jnp.where(degen, 0.0, r * jnp.sin(theta))
    return px, py


def generate_camera_rays(
    cam: CameraParams,
    resolution: tuple[int, int],
    options: RenderOptions,
    uniforms,  # [4, N] rows: aa_x, aa_y, dof_u, dof_v
):
    """Returns (origins Vec3, directions Vec3) over N = W*H lanes."""
    width, height = resolution
    n = width * height
    idx = jnp.arange(n, dtype=jnp.int32)
    x = (idx % width).astype(jnp.float32)
    y = (idx // width).astype(jnp.float32)

    if options.antialiasing:
        x = x + (uniforms[0] - 0.5)  # U(-0.5, 0.5), pathtrace.cu:267
        y = y + (uniforms[1] - 0.5)

    # direction = normalize(view - right*plx*(x - w/2) - up*ply*(y - h/2))
    sx = cam.pixel_length[0] * (x - width * 0.5)
    sy = cam.pixel_length[1] * (y - height * 0.5)
    d = Vec3(
        cam.view[0] - cam.right[0] * sx - cam.up[0] * sy,
        cam.view[1] - cam.right[1] * sx - cam.up[1] * sy,
        cam.view[2] - cam.right[2] * sx - cam.up[2] * sy,
    )
    d = v3.normalize(d)
    o = Vec3(
        jnp.broadcast_to(cam.position[0], (n,)),
        jnp.broadcast_to(cam.position[1], (n,)),
        jnp.broadcast_to(cam.position[2], (n,)),
    )

    if options.depth_of_field and options.lens_radius > 0:
        px, py = _concentric_disk(uniforms[2], uniforms[3])
        px = options.lens_radius * px
        py = options.lens_radius * py
        ft = jnp.abs(options.focal_distance / d.z)
        focus = Vec3(o.x + d.x * ft, o.y + d.y * ft, o.z + d.z * ft)
        o = Vec3(o.x + px, o.y + py, o.z)
        d = v3.normalize(focus - o)

    return o, d
