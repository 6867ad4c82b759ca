"""Pallas megakernel: one Monte-Carlo iteration in ONE TPU kernel.

For primitive-only scenes (cube/sphere — the Cornell family), the whole
iteration — raygen with AA jitter, the full bounce loop with statically
unrolled geometry, BSDF shading, and the pi-weighted gather — runs inside a
single `pallas_call`. Ray state lives in VMEM tiles for the kernel's entire
lifetime: zero HBM traffic between bounces (the XLA wavefront path round-trips
~10 state arrays per bounce), and all randomness comes from the on-core
hardware PRNG.

The geometry/shading math is the SAME code as the XLA path
(ops.trace.primitives_hit + render.shade.shade_soa, both shape-agnostic over
2D VMEM tiles), so the megakernel inherits the oracle-checked semantics.

Scenes with meshes/textures fall back to the wavefront path (render_sample).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import vec3 as v3
from ..ops.trace import primitives_hit
from ..ops.vec3 import Vec3
from .shade import PathStateSoA, albedo_soa, shade_soa

PI = math.pi

ROWS = 32  # rays per tile = ROWS x 128
LANES = 128


def supports_megakernel(meta, options) -> bool:
    """Primitive scenes, plus small meshes baked as literals (mega_faces);
    textured scenes and large meshes fall back to the wavefront path."""
    mesh_ok = (not meta.has_obj) or (
        meta.mega_faces and len(meta.mega_faces) == meta.num_faces
    )
    return bool(
        mesh_ok
        and not meta.has_textures
        and not options.first_bounce_cache_active
    )


def _uniform(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    mant = pltpu.bitcast(bits >> 8, jnp.int32)
    return mant.astype(jnp.float32) * (1.0 / (1 << 24))


def _make_kernel(meta, options):
    width, height = meta.resolution
    trace_depth = meta.trace_depth

    def kernel(seed_ref, cam_ref, r_ref, g_ref, b_ref, ar_ref, ag_ref, ab_ref):
        pid = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] * jnp.int32(np.int32(np.uint32(0x9E3779B1))) + pid)

        # ---- raygen (generateRayFromCamera, pathtrace.cu:248-297) ----------
        base = pid * (ROWS * LANES)
        row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
        colm = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
        idx = base + row * LANES + colm
        x = (idx % width).astype(jnp.float32)
        y = (idx // width).astype(jnp.float32)
        in_image = idx < (width * height)

        if options.antialiasing:
            x = x + (_uniform((ROWS, LANES)) - 0.5)
            y = y + (_uniform((ROWS, LANES)) - 0.5)

        sx = cam_ref[12] * (x - width * 0.5)
        sy = cam_ref[13] * (y - height * 0.5)
        d = v3.normalize(
            Vec3(
                cam_ref[3] - cam_ref[9] * sx - cam_ref[6] * sy,
                cam_ref[4] - cam_ref[10] * sx - cam_ref[7] * sy,
                cam_ref[5] - cam_ref[11] * sx - cam_ref[8] * sy,
            )
        )
        shape = (ROWS, LANES)
        o = Vec3(
            jnp.full(shape, 0.0) + cam_ref[0],
            jnp.full(shape, 0.0) + cam_ref[1],
            jnp.full(shape, 0.0) + cam_ref[2],
        )

        ones = jnp.ones(shape, jnp.float32)
        state = PathStateSoA(
            origin=o,
            direction=d,
            color=Vec3(ones, ones * 1.0, ones * 1.0),
            remaining=jnp.full(shape, trace_depth, jnp.int32),
        )

        albedo = None
        for depth in range(trace_depth):
            hit = primitives_hit(meta, state.origin, state.direction)
            if depth == 0:
                albedo = albedo_soa(meta, None, hit)
            u_choice = _uniform(shape)
            u1 = _uniform(shape)
            u2 = _uniform(shape)
            state = shade_soa(meta, None, state, hit, u_choice, u1, u2)

        mask = in_image.astype(jnp.float32)
        r_ref[:, :] = state.color.x * (PI * mask)
        g_ref[:, :] = state.color.y * (PI * mask)
        b_ref[:, :] = state.color.z * (PI * mask)
        ar_ref[:, :] = albedo.x * mask
        ag_ref[:, :] = albedo.y * mask
        ab_ref[:, :] = albedo.z * mask

    return kernel


@functools.partial(jax.jit, static_argnames=("meta", "options"))
def megakernel_sample(meta, options, camera, iteration, base_key):
    """One full MC iteration via the megakernel.

    Returns (color Vec3 [N], albedo Vec3 [N]) — albedo is this sample's
    first-hit AOV (caller applies the iteration==1 rule).
    """
    width, height = meta.resolution
    n = width * height
    tile = ROWS * LANES
    n_pad = ((n + tile - 1) // tile) * tile
    grid = (n_pad // tile,)

    ikey = jax.random.fold_in(base_key, iteration)
    seed = jax.random.randint(ikey, (1,), 0, 2**31 - 1, dtype=jnp.int32)
    cam_vec = jnp.concatenate(
        [camera.position, camera.view, camera.up, camera.right, camera.pixel_length]
    ).astype(jnp.float32)

    out_shape = [jax.ShapeDtypeStruct((n_pad // LANES, LANES), jnp.float32)] * 6
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_kernel(meta, options),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[spec] * 6,
        out_shape=out_shape,
    )(seed, cam_vec)

    flat = [a.reshape(-1)[:n] for a in outs]
    return Vec3(*flat[:3]), Vec3(*flat[3:])
